package graft.queries

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

/** Source-format coverage beyond parquet: the engine's operators are
  * format-agnostic DataFrame transforms, so JSON and CSV corpora plug in
  * through spark.read with an explicit schema — this spec proves the
  * round-trip preserves every row and that a representative operator
  * (token counting) produces identical results over all three formats.
  *
  * Reference analog: the reference's storage layer serializes values to
  * an opaque binary log (library/GraphDB/Storage.hs:154-177) — the format
  * boundary there is also below the operator layer, which is the property
  * checked here.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tokenCounts(df: DataFrame): Set[(Long, Long)] = {
    import spark.implicits._
    df.select(org.apache.spark.sql.functions.col("doc_id"),
      graft.pipeline.TextAnalysis.tokenCount(
        org.apache.spark.sql.functions.col("text")).as("n"))
      .as[(Long, Long)].collect().toSet
  }

  test("documents round-trip through JSON, CSV and ORC with identical operator results") {
    val pq = graft.Tables.load(spark, sf, "documents")
    val schema = pq.schema
    val dir = java.nio.file.Files.createTempDirectory("graft_sources").toString

    pq.write.mode("overwrite").json(s"$dir/documents.json")
    // header carries names; schema is supplied explicitly (CSV is untyped)
    pq.write.mode("overwrite").option("header", "true")
      .option("escape", "\"").csv(s"$dir/documents.csv")
    // ORC is the other self-describing columnar format Spark ships natively
    pq.write.mode("overwrite").orc(s"$dir/documents.orc")

    val fromJson = spark.read.schema(schema).json(s"$dir/documents.json")
    val fromCsv = spark.read.schema(schema).option("header", "true")
      .option("escape", "\"").csv(s"$dir/documents.csv")
    val fromOrc = spark.read.orc(s"$dir/documents.orc")

    assert(fromJson.count() === pq.count())
    assert(fromCsv.count() === pq.count())
    assert(fromOrc.count() === pq.count())
    assert(fromOrc.schema === schema, "ORC must carry the schema itself")

    val base = tokenCounts(pq)
    assert(tokenCounts(fromJson) === base, "JSON source must be operator-identical")
    assert(tokenCounts(fromCsv) === base, "CSV source must be operator-identical")
    assert(tokenCounts(fromOrc) === base, "ORC source must be operator-identical")
  }

  test("gzipped JSONL round-trips (the wire format web corpora ship as)") {
    val pq = graft.Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString
    pq.write.mode("overwrite").option("compression", "gzip")
      .json(s"$dir/documents.jsonl.gz")
    val files = new java.io.File(s"$dir/documents.jsonl.gz").listFiles()
      .map(_.getName).filter(_.endsWith(".json.gz"))
    assert(files.nonEmpty, "output must actually be gzip-compressed")
    val back = spark.read.schema(pq.schema).json(s"$dir/documents.jsonl.gz")
    assert(tokenCounts(back) === tokenCounts(pq),
      "gzipped JSONL source must be operator-identical")
  }

  test("export file-count control: repartition bounds the small-files problem") {
    // at 100 TB an uncontrolled write emits one file per task — millions
    // of tiny files; repartition(n) before write pins the output layout
    val pq = graft.Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("graft_filecount").toString
    pq.repartition(4).write.mode("overwrite").parquet(s"$dir/four")
    val parts = new java.io.File(s"$dir/four").listFiles()
      .map(_.getName).count(_.endsWith(".parquet"))
    assert(parts === 4, s"repartition(4) must emit exactly 4 files, got $parts")
    val back = spark.read.parquet(s"$dir/four")
    assert(back.count() === pq.count())
  }

  test("ORC scan pushes predicates and prunes columns like parquet") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_plan").toString
    graft.Tables.load(spark, sf, "documents").write.mode("overwrite")
      .orc(s"$dir/documents.orc")
    val p = spark.read.orc(s"$dir/documents.orc")
      .where(org.apache.spark.sql.functions.col("doc_id") > 100L)
      .select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(p.contains("GreaterThan(doc_id,100)"),
      s"filter must reach the ORC scan:\n$p")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p)
      .map(_.group(1)).getOrElse("")
    assert(read == "doc_id:bigint,lang:string",
      s"ORC scan must read only (doc_id, lang), got: $read")
  }
}
