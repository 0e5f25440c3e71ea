package graft.graph

import org.scalatest.funsuite.AnyFunSuite

/** Lifecycle of the memoized geo-graph session cache: per-session keying,
  * explicit eviction, rebuild-on-demand. (The previous WeakHashMap keying
  * could never actually collect an entry — the cached DataFrames strongly
  * reference their session, which is the map key.)
  */
class GraphQueriesCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("geo-graph cache: per-session keying, explicit eviction, rebuild") {
    val g1 = GraphQueries.geoGraph(spark, sf, withCustomers = false)
    assert(GraphQueries.cachedSessions.contains(org.apache.spark.sql.GraftShim.sessionUUID(spark)))
    // same session + args → memoized (reference-identical) state
    assert(GraphQueries.geoGraph(spark, sf, withCustomers = false) eq g1)
    GraphQueries.evictSession(org.apache.spark.sql.GraftShim.sessionUUID(spark))
    assert(!GraphQueries.cachedSessions.contains(org.apache.spark.sql.GraftShim.sessionUUID(spark)))
    val g2 = GraphQueries.geoGraph(spark, sf, withCustomers = false)
    assert(!(g2 eq g1), "evicted entry must be rebuilt, not resurrected")
    assert(g2.nodes.count() === g1.nodes.count())
  }

  test("a cloned session gets its own cache entry, evictable independently") {
    val clone = spark.newSession()
    try {
      val base = GraphQueries.geoGraph(spark, sf, withCustomers = false)
      val cloned = GraphQueries.geoGraph(clone, sf, withCustomers = false)
      assert(!(cloned eq base), "sessions must not share cached state")
      assert(GraphQueries.cachedSessions.contains(org.apache.spark.sql.GraftShim.sessionUUID(clone)))
      GraphQueries.evictSession(org.apache.spark.sql.GraftShim.sessionUUID(clone))
      assert(!GraphQueries.cachedSessions.contains(org.apache.spark.sql.GraftShim.sessionUUID(clone)))
      assert(GraphQueries.cachedSessions.contains(org.apache.spark.sql.GraftShim.sessionUUID(spark)),
        "evicting one session must not touch another's entries")
    } finally GraphQueries.evictSession(org.apache.spark.sql.GraftShim.sessionUUID(clone))
  }
}
