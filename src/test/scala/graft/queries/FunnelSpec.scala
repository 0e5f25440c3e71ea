package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

/** Hand-computed truth for the r25 ordered funnel: strict after-ordering,
  * pre-view clicks ignored, unreached stages null.
  */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("funnel honors strict event order per user") {
    import spark.implicits._
    val us = 1000000L // 1s in micros
    val ev = Seq(
      // user 1: full funnel in order
      (1L, "view", 1L * us), (1L, "click", 2L * us), (1L, "purchase", 3L * us),
      // user 2: click BEFORE the first view — funnel stalls at view
      (2L, "click", 1L * us), (2L, "view", 2L * us), (2L, "purchase", 3L * us),
      // user 3: view+click, purchase before click — stalls at click
      (3L, "view", 1L * us), (3L, "purchase", 2L * us), (3L, "click", 4L * us),
      // user 4: never views — not in the funnel at all
      (4L, "click", 1L * us), (4L, "purchase", 2L * us))
      .toDF("user_id", "event_type", "_us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("_us")).as("ts"))
    ev.write.mode("overwrite").parquet("/tmp/graft_funnel_events/events.parquet")

    val out = graft.queries.Declared.all.find(_.name == "r25_funnel").get
      .run(spark, "/tmp/graft_funnel_events")
      .select("user_id", "t_view", "t_click", "t_purchase")
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toSeq
    assert(out === Seq(
      (1L, Some(1L * us), Some(2L * us), Some(3L * us)),
      (2L, Some(2L * us), None, None),
      (3L, Some(1L * us), Some(4L * us), None)))
  }
}
