package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

/** The co-located join story for 100 TB: when both join sides are written
  * bucketed by the join key with the same bucket count, the join plans with
  * NO shuffle exchange — each task reads matching buckets directly. This is
  * the persistence layout a production deployment gives the graph adjacency
  * tables (GraphStore checkpoints repartition by `src` for the same reason
  * within a session; bucketing makes it survive restarts).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    // disable broadcast so the test exercises the shuffle-vs-bucket path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      graft.Tables.load(spark, sf, "orders")
        .write.format("parquet").bucketBy(8, "o_custkey")
        .mode("overwrite").saveAsTable("b_orders")
      graft.Tables.load(spark, sf, "customer")
        .withColumn("o_custkey", col("c_custkey"))
        .write.format("parquet").bucketBy(8, "o_custkey")
        .mode("overwrite").saveAsTable("b_customer")

      val join = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      val physical = join.queryExecution.executedPlan.toString

      // the JOIN reads matching buckets directly — no exchange anywhere in
      // its plan (a later groupBy on another key may of course still shuffle)
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle; plan:\n$physical")
      assert(physical.contains("Bucketed: true"),
        s"scan must be bucket-aware; plan:\n$physical")

      val joined = join.groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))

      // and it computes the same answer as the unbucketed join
      val expected = graft.Tables.load(spark, sf, "orders")
        .join(graft.Tables.load(spark, sf, "customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
