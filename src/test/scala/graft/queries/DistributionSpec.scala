package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

/** ntileBucketed must equal the built-in ntile() window exactly — tile by
  * tile, row by row — while never sorting a whole partition on one task.
  */
class DistributionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(rows: Seq[(String, Double, Long)], tiles: Int,
      buckets: Int): Unit = {
    import spark.implicits._
    val df = rows.toDF("p", "v", "id")
    val got = Distribution.ntileBucketed(df, "p", "v", "id", tiles, buckets)
      .select("p", "id", "tile")
      .as[(String, Long, Long)].collect().toMap2
    val w = Window.partitionBy("p").orderBy(col("v"), col("id"))
    val want = df.withColumn("tile", ntile(tiles).over(w).cast("bigint"))
      .select("p", "id", "tile")
      .as[(String, Long, Long)].collect().toMap2
    assert(got === want, s"tiles=$tiles buckets=$buckets")
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[(A, B), C] = rows.map(r => (r._1, r._2) -> r._3).toMap
  }

  test("matches ntile() on random data, including duplicate values") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map { id =>
      val p = s"g${rnd.nextInt(3)}"
      // coarse values force duplicates (bucket-border ties)
      (p, rnd.nextInt(20).toDouble, id)
    }
    check(rows, tiles = 4, buckets = 8)
    check(rows, tiles = 7, buckets = 1)   // single bucket = degenerate path
    check(rows, tiles = 3, buckets = 512) // more buckets than values
  }

  test("groups smaller than the tile count get one row per tile") {
    val rows = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 5.0, 3L))
    check(rows, tiles = 4, buckets = 16)
  }

  test("constant-value group (mx == mn) still tiles by the tiebreak") {
    val rows = (1L to 10L).map(id => ("c", 42.0, id))
    check(rows, tiles = 4, buckets = 32)
  }

  test("property: == ntile() for random data, tile counts and bucket counts") {
    // raw scalacheck Gen with fixed seeds (scalatestplus is not in the
    // offline cache) — deterministic across runs, seed printed on failure
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.choose(1, 80)
      tiles <- Gen.choose(1, 9)
      buckets <- Gen.choose(1, 40)
      // values from a tiny domain force heavy duplication across buckets
      vals <- Gen.listOfN(n, Gen.choose(-5, 5))
      parts <- Gen.listOfN(n, Gen.oneOf("a", "b"))
    } yield (vals.zip(parts).zipWithIndex.map { case ((v, p), i) =>
      (p, v.toDouble, i.toLong)
    }, tiles, buckets)
    (1 to 12).foreach { i =>
      val (rows, tiles, buckets) = gen(Gen.Parameters.default, Seed(100L + i))
        .getOrElse(sys.error(s"gen failed for seed ${100L + i}"))
      withClue(s"seed ${100L + i} tiles=$tiles buckets=$buckets: ") {
        check(rows, tiles, buckets)
      }
    }
  }

  test("r26 plan ranks by (priority, bucket) — never a priority-only data window") {
    val p = graft.SparkEntry.queries("r26_ntile_quartiles")(
      spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p.contains("ntile("), s"built-in ntile crept back:\n$p")
    assert("windowspecdefinition\\(o_orderpriority#\\d+, _b#".r
      .findFirstIn(p).isDefined,
      s"rank window must be keyed by (priority, bucket):\n$p")
    // the only priority-only windows may consume the bucket-count table
    // (grouped: carries _b or _bc), never raw order rows (o_orderkey)
    val prioOnly = "windowspecdefinition\\(o_orderpriority#\\d+, o_orderkey".r
    assert(prioOnly.findFirstIn(p).isEmpty,
      s"a priority-only window over the data single-threads at scale:\n$p")
  }
}
