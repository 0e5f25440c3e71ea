package graft.graph

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Declared.Q

/** Declared queries executed through the GRAPH layer — the star schema
  * interpreted as the reference's rooted indexed graph
  * (root → region → nation → customer), bulk-loaded via
  * [[GraphState.bulkLoad]] and traversed via index equi-joins (the Spark
  * mapping of `getTargets`, /root/reference/library/GraphDB/Graph.hs:129-133).
  * Each has a DuckDB oracle over the same tables, proving the graph layer
  * computes the same answers as the relational mapping.
  *
  * Node-id scheme (stable, collision-free): root=0, region = 1+r_regionkey,
  * nation = 100+n_nationkey, customer = 1000+c_custkey.
  */
object GraphQueries {

  sealed trait GeoV
  case object GeoRoot extends GeoV
  final case class RegionV(name: String) extends GeoV
  final case class NationV(name: String) extends GeoV
  final case class CustomerV(custkey: Long) extends GeoV

  /** Per-edge index emission for the geo graph — user logic, exactly the
    * part the reference's `deriveSetup` macro leaves user-supplied
    * (M.indexes, /root/reference/library/GraphDB/Model.hs). Shared by the
    * derived [[GeoModel]] and the hand-written [[GeoModelHand]] fixture.
    */
  def geoIndexes(target: GeoV, source: GeoV): Seq[IndexKey] = (target, source) match {
    case (RegionV(n), GeoRoot) => Seq(IndexKey("Region_Name", n))
    case (NationV(n), RegionV(_)) => Seq(IndexKey("Nation"), IndexKey("Nation_Name", n))
    case (CustomerV(_), NationV(_)) => Seq(IndexKey("Nation_Customer"))
    case _ => Seq.empty
  }

  /** The PRIMARY geo model, runtime-derived from the sealed `GeoV` ADT —
    * every declared graph query (g1-g6, gq1-gq4) runs on derived codecs,
    * and the index dispatch is ASSEMBLED from per-edge declarations (the
    * `Edge` instance analog) rather than hand-matched. DeriveSpec proves
    * it member-for-member equal to [[GeoModelHand]].
    */
  val GeoModel: GraphModel[GeoV] = GraphModel.derive[GeoV](
    indexesFn = GraphModel.indexesFromEdges[GeoV](Seq(
      GraphModel.edge[RegionV, GeoRoot.type](r =>
        Seq(IndexKey("Region_Name", r.name))),
      GraphModel.edge[NationV, RegionV](n =>
        Seq(IndexKey("Nation"), IndexKey("Nation_Name", n.name))),
      GraphModel.edge[CustomerV, NationV](_ =>
        Seq(IndexKey("Nation_Customer"))))),
    kindNames = Map("GeoRoot" -> "Root", "RegionV" -> "Region",
      "NationV" -> "Nation", "CustomerV" -> "Customer"))

  /** Hand-written codec, kept as the derivation cross-check fixture (the
    * MacrosTests.hs/THTests.hs analog — TH-generated vs explicit Setup).
    */
  private[graft] object GeoModelHand extends GraphModel[GeoV] {
    val valueSchema: StructType = StructType(Seq(
      StructField("name", StringType, nullable = true),
      StructField("custkey", LongType, nullable = true)))

    def kindOf(v: GeoV): String = v match {
      case GeoRoot => "Root"
      case _: RegionV => "Region"
      case _: NationV => "Nation"
      case _: CustomerV => "Customer"
    }

    def toValueRow(v: GeoV): Row = v match {
      case GeoRoot => Row(null, null)
      case RegionV(n) => Row(n, null)
      case NationV(n) => Row(n, null)
      case CustomerV(k) => Row(null, k)
    }

    def fromValueRow(kind: String, row: Row): GeoV = kind match {
      case "Root" => GeoRoot
      case "Region" => RegionV(row.getString(0))
      case "Nation" => NationV(row.getString(0))
      case "Customer" => CustomerV(row.getLong(1))
    }

    def indexes(target: GeoV, source: GeoV): Seq[IndexKey] =
      geoIndexes(target, source)
  }

  // A real deployment opens the graph session once and serves many reads
  // (the reference's runPersistentSession model) — so the bulk-loaded state
  // is memoized per (session, dir, variant) and materialized via
  // localCheckpoint: the first query pays the index derivation, subsequent
  // hops read cached partitions. Keyed on `sessionUUID`, NOT weakly on the
  // SparkSession object: a WeakHashMap entry whose VALUE (the cached
  // GraphState's DataFrames) strongly references its key's session can
  // never be collected, so the weak keying was unbounded retention in
  // disguise. Eviction is explicit instead: a context-shutdown listener
  // clears the map (the cached plans are unusable once their context
  // stops), and [[evictSession]] drops one session's entries.
  private val built =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.ConcurrentHashMap[(String, Boolean), GraphState[GeoV]]]()
  private val evictorInstalled =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** Drop the cached geo-graph states of one session (by `sessionUUID`). */
  def evictSession(sessionUUID: String): Unit = built.remove(sessionUUID)

  private[graph] def cachedSessions: Set[String] = {
    import scala.jdk.CollectionConverters._
    built.keySet.asScala.toSet
  }

  /** Bulk-load the geo graph from the parquet tables — all derivation stays
    * distributed (no collect): node/edge DataFrames are column projections,
    * the index is a join + flatMap over the model's key emission.
    */
  def geoGraph(s: SparkSession, d: String, withCustomers: Boolean): GraphState[GeoV] = {
    evictorInstalled.computeIfAbsent(s.sparkContext.applicationId, _ => {
      s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
          built.clear() // every cached plan belonged to the stopped context
      })
      java.lang.Boolean.TRUE
    })
    built
      .computeIfAbsent(org.apache.spark.sql.GraftShim.sessionUUID(s), _ =>
        new java.util.concurrent.ConcurrentHashMap[(String, Boolean), GraphState[GeoV]]())
      .computeIfAbsent((d, withCustomers),
        _ => buildGeoGraph(s, d, withCustomers)) // bulkLoad materializes stage-wise
  }

  private def buildGeoGraph(s: SparkSession, d: String, withCustomers: Boolean): GraphState[GeoV] = {
    val region = graft.Tables.load(s, d, "region")
    val nation = graft.Tables.load(s, d, "nation")
    val rootDF = s.sql("SELECT CAST(0 AS LONG) AS id, 'Root' AS kind, " +
      "named_struct('name', CAST(NULL AS STRING), 'custkey', CAST(NULL AS LONG)) AS value")
    val regionNodes = region.select(
      (col("r_regionkey").cast(LongType) + 1).as("id"),
      lit("Region").as("kind"),
      struct(col("r_name").as("name"), lit(null).cast(LongType).as("custkey")).as("value"))
    val nationNodes = nation.select(
      (col("n_nationkey").cast(LongType) + 100).as("id"),
      lit("Nation").as("kind"),
      struct(col("n_name").as("name"), lit(null).cast(LongType).as("custkey")).as("value"))
    val rootEdges = region.select(
      lit(0L).as("src"), (col("r_regionkey").cast(LongType) + 1).as("dst"))
    val nationEdges = nation.select(
      (col("n_regionkey").cast(LongType) + 1).as("src"),
      (col("n_nationkey").cast(LongType) + 100).as("dst"))
    val (nodes, edges) =
      if (!withCustomers) (rootDF.unionByName(regionNodes).unionByName(nationNodes),
        rootEdges.unionByName(nationEdges))
      else {
        val customer = graft.Tables.load(s, d, "customer")
        val custNodes = customer.select(
          (col("c_custkey") + 1000).as("id"),
          lit("Customer").as("kind"),
          struct(lit(null).cast(StringType).as("name"), col("c_custkey").as("custkey")).as("value"))
        val custEdges = customer.select(
          (col("c_nationkey").cast(LongType) + 100).as("src"),
          (col("c_custkey") + 1000).as("dst"))
        (rootDF.unionByName(regionNodes).unionByName(nationNodes).unionByName(custNodes),
          rootEdges.unionByName(nationEdges).unionByName(custEdges))
      }
    GraphState.bulkLoad(s, GeoModel, nodes, edges)
  }

  /** One index hop: targets of `from` under key (kind, key?), as a DF of dst
    * ids — `getTargets` as a composable plan fragment. Emits dst ids in
    * BAG form (r19): every consumer is a left-semi join (the next hop, or
    * the final nodes lookup), which is duplicate-insensitive, so the
    * per-hop `distinct()` was one pure-overhead exchange per hop — the
    * visited-set dedup the reference specifies (Graph.hs:72-77) is
    * re-established by the final semi-join against the unique-id nodes
    * table. Result rows identical; gq1 drops 2 and gq2 drops 3 exchanges.
    */
  private def hop(index: DataFrame, from: DataFrame, kkind: String,
      key: Option[String]): DataFrame = {
    val keyed = key.fold(index.where(col("kkind") === kkind))(k =>
      index.where(col("kkind") === kkind && col("key") === k))
    keyed.join(from, keyed("src") === from("id"), "left_semi")
      .select(col("dst").as("id"))
  }

  val all: Seq[Q] = Seq(
    // root →(Region_Name ASIA) region →(Nation) nations → names.
    Q("gq1_graph_region_nations",
      (s, d) => {
        val g = geoGraph(s, d, withCustomers = false)
        val rootIds = s.sql("SELECT CAST(0 AS LONG) AS id")
        val asia = hop(g.index, rootIds, "Region_Name", Some("ASIA"))
        val nations = hop(g.index, asia, "Nation", None)
        g.nodes.join(nations, Seq("id"), "left_semi")
          .select(col("value.name").as("name"))
          .orderBy("name")
      },
      Some("""SELECT n.n_name AS name FROM nation n
             |JOIN region r ON n.n_regionkey = r.r_regionkey
             |WHERE r.r_name = 'ASIA' ORDER BY name""".stripMargin)),

    // 3-hop via the graph index — same answer as g3_three_hop's relational plan.
    Q("gq2_graph_asia_customers",
      (s, d) => {
        val g = geoGraph(s, d, withCustomers = true)
        val rootIds = s.sql("SELECT CAST(0 AS LONG) AS id")
        val asia = hop(g.index, rootIds, "Region_Name", Some("ASIA"))
        val nations = hop(g.index, asia, "Nation", None)
        val customers = hop(g.index, nations, "Nation_Customer", None)
        g.nodes.join(customers, Seq("id"), "left_semi")
          .select(col("value.custkey").as("c_custkey"))
          .orderBy("c_custkey")
      },
      Some("""SELECT DISTINCT c.c_custkey FROM region r
             |JOIN nation n ON n.n_regionkey = r.r_regionkey
             |JOIN customer c ON c.c_nationkey = n.n_nationkey
             |WHERE r.r_name = 'ASIA' ORDER BY c.c_custkey""".stripMargin)),

    // getStats over the bulk-loaded graph, BFS-scoped from root; the oracle
    // recomputes the same triple arithmetically from the base tables.
    Q("gq3_graph_stats",
      (s, d) => {
        import s.implicits._
        val g = geoGraph(s, d, withCustomers = true)
        val (n, e, i) = g.stats(0L)
        Seq((n, e, i)).toDF("gnodes", "gedges", "gindex")
      },
      Some("""SELECT (1 + (SELECT COUNT(*) FROM region)
             |          + (SELECT COUNT(*) FROM nation)
             |          + (SELECT COUNT(*) FROM customer)) AS gnodes,
             |       ((SELECT COUNT(*) FROM region)
             |          + (SELECT COUNT(*) FROM nation)
             |          + (SELECT COUNT(*) FROM customer)) AS gedges,
             |       ((SELECT COUNT(*) FROM region)
             |          + 2 * (SELECT COUNT(*) FROM nation)
             |          + (SELECT COUNT(*) FROM customer)) AS gindex""".stripMargin)),

    // The reference's flagship Demo query: a word-split SearchTerm index
    // (one index key PER WORD of the value — the multi-key `indexes`
    // emission, /root/reference/executables/Demo.hs:24-28) hit by a
    // getTargets lookup (Demo.hs:66-71). Relationally: explode the name
    // into words at index-build time, equi-filter at query time — the
    // inverted-index shape. Bag semantics preserved (a name repeating the
    // word would emit the key twice; lookup dedupes per Graph.hs:72-77,
    // hence DISTINCT).
    Q("gq4_search_term_index",
      (s, d) =>
        graft.Tables.load(s, d, "part")
          .select(col("p_partkey"),
            explode(split(col("p_name"), " ")).as("_w"))
          .where(col("_w") === "red")
          .select("p_partkey").distinct()
          .orderBy("p_partkey"),
      Some("""SELECT DISTINCT p_partkey FROM (
             |  SELECT p_partkey, unnest(string_split(p_name, ' ')) AS w
             |  FROM part)
             |WHERE w = 'red' ORDER BY p_partkey""".stripMargin))
  )
}
