package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All declared queries read parquet directly so Catalyst sees the scan:
  * filters and column pruning reach the parquet reader (PushedFilters /
  * ReadSchema in `.explain`), which is the 100 TB posture — never cache a
  * full table when the plan only needs two columns of it.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is stored as parquet TIMESTAMP(NANOS), which Spark has no
    * native type for. Read it as nanos-since-epoch LONG and convert with
    * integer division (exact — a double intermediate would lose precision
    * above 2^53 ns). The µs `ts` TRUNCATES sub-microsecond digits (the
    * data IS ns-granular), so the raw long rides along as `ts_ns` for
    * consumers whose ORDERING must match an engine that sees full ns
    * precision — DuckDB reads the same parquet at ns, and two events of
    * one user inside the same microsecond would order differently by the
    * truncated ts (r7 orders by ts_ns for exactly this reason).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    nanosToTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** The single nanos-LONG → timestamp conversion, shared by the batch
    * reader above and the streaming reader (EventStreams.readEvents) so
    * the two can never drift.
    */
  private[graft] def nanosToTs(df: DataFrame): DataFrame =
    df.withColumn("ts_ns", col("ts"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
}
