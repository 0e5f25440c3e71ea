package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

class AsOfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("asofJoin picks latest right ≤ left time; inclusive; null when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // matches right at t=10 (latest ≤ 10)
      (1L, 101L, 15L), // matches t=15 exactly (inclusive)
      (1L, 102L, 4L),  // before any right row → null
      (2L, 103L, 50L)  // other key: matches its own timeline only
    ).toDF("k", "event_id", "t")
    val right = Seq(
      (1L, 5L, "r5"), (1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 99L, "r99"),
      (2L, 49L, "s49"), (2L, 51L, "s51")
    ).toDF("rk", "rt", "tag")
    val out = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("tag"))
      .orderBy("event_id").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) null else r.getString(3)))
      .toMap
    assert(out === Map(100L -> "r10", 101L -> "r15", 102L -> null, 103L -> "s49"))
  }

  test("matched right row is atomic: its NULL fields stay NULL (no stitching)") {
    import spark.implicits._
    val left = Seq((1L, 100L, 20L)).toDF("k", "event_id", "t")
    // latest right ≤ 20 is t=15 with tag=null — ASOF semantics require the
    // WHOLE t=15 row (tag NULL), not tag falling back to the older t=10 row
    val right = Seq(
      (1L, 10L, Option("old"), Option("o10")),
      (1L, 15L, Option.empty[String], Option("o15"))
    ).toDF("rk", "rt", "tag", "other")
    val row = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("tag", "other"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("tag")))
    assert(row.getString(row.fieldIndex("other")) === "o15")
  }

  test("right rows with NULL time or key match nothing (ASOF semantics)") {
    import spark.implicits._
    val left = Seq((1L, 100L, 5L)).toDF("k", "event_id", "t")
    // the only right rows are a NULL-time and a NULL-key row: neither may
    // match (leftTime >= NULL is UNKNOWN; NULL keys never equal)
    val right = Seq(
      (Option(1L), Option.empty[Long], "null-time"),
      (Option.empty[Long], Option(1L), "null-key")
    ).toDF("rk", "rt", "tag")
    val row = AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("tag"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("tag")))
  }

  test("payload/internal name collisions are rejected up front") {
    import spark.implicits._
    val left = Seq((1L, 1L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 1L, "y")).toDF("rk", "rt", "tag")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left, right, "k", "rk", "t", "rt", Seq("tag"))
    }
    val leftReserved = Seq((1L, 1L, "x")).toDF("k", "t", "_side")
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(leftReserved, right, "k", "rk", "t", "rt", Seq("tag"))
    }
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(left.drop("tag"), right, "k", "rk", "t", "rt", Seq("nope"))
    }
  }
}
