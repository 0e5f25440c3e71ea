package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of fact rows share one key — the shape that melts one reducer
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val dim = (1L to 2000L).map(k => (k, s"dim-$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted

    assert(salted.toSeq === plain.toSeq)
    // and the hot key's rows really spread over several salt values
    val spread = fact
      .withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .where(col("k") === 7L)
      .select("_salt").distinct().count()
    assert(spread > 1, "salt must split the hot key across reducers")
  }
}
