package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The declared query set from SURVEY.md §2.D: every query the driver
  * hash-checks against a DuckDB oracle at sf0.01.
  *
  * Graph queries (G*) are the Spark mapping of the reference's traversal
  * primitives (`getTargets` = index equi-join, `traverseSources` = reverse
  * join, `getStats` = counts — /root/reference/library/GraphDB/Graph.hs:69-139),
  * expressed over the star schema exactly how the reference's own Postgres
  * benchmark relationalizes its graph
  * (/root/reference/executables/Benchmarks/Postgres.hs:44-133).
  *
  * Scale notes (100 TB posture):
  *  - dimension hops (region, nation) are broadcast — they stay tiny at any SF;
  *  - fact-fact joins (orders⋈customer, lineitem⋈orders) shuffle on their
  *    keys and rely on AQE for skew/size re-planning;
  *  - every aggregate is a partial (map-side) hash agg by construction;
  *  - all floating aggregates ROUND(_, 2) and every query is fully ordered
  *    so result hashes are engine-stable.
  *
  * Column names are aliased IDENTICALLY in the DataFrame code and the
  * oracle SQL — the driver sorts columns by name before hashing.
  */
object Declared {

  final case class Q(
      name: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    graft.Tables.load(s, d, name)

  /** One ANSI string, two engines (r19): TPC-H Q3-shaped segment revenue. */
  private[queries] val r19Sql: String =
    """SELECT o.o_orderkey, o.o_orderpriority,
      |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY o.o_orderkey, o.o_orderpriority
      |ORDER BY rev DESC, o.o_orderkey LIMIT 20""".stripMargin

  val all: Seq[Q] = Seq(
    // ---------------------------------------------------------------- G1
    // Inventory #5 getTargets: index lookup by secondary key.
    Q("g1_index_lookup",
      (s, d) =>
        t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------------------- G2
    // 1-hop traversal: customers(BUILDING) -> orders. Bag semantics, no dedup
    // (hop results are lists — Catalogue.hs:92-95).
    Q("g2_one_hop",
      (s, d) => {
        val c = t(s, d, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        t(s, d, "orders")
          .join(c, col("o_custkey") === col("c_custkey"))
          .select("o_orderkey")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o.o_orderkey FROM orders o
             |JOIN customer c ON o.o_custkey = c.c_custkey
             |WHERE c.c_mktsegment = 'BUILDING' ORDER BY o.o_orderkey""".stripMargin)),

    // ---------------------------------------------------------------- G3
    // 3-hop chain (Q-lookupArtistsBySongGenreName analog, Catalogue.hs:88-96):
    // root -> region(ASIA) -> nation -> customer, dedup'd. region+nation are
    // broadcast dims: the only shuffle is the final distinct.
    Q("g3_three_hop",
      (s, d) => {
        val r = t(s, d, "region").filter(col("r_name") === "ASIA").select("r_regionkey")
        val n = t(s, d, "nation").join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey")
        t(s, d, "customer")
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .select("c_custkey")
          .distinct()
          .orderBy("c_custkey")
      },
      Some("""SELECT DISTINCT c.c_custkey FROM region r
             |JOIN nation n ON n.n_regionkey = r.r_regionkey
             |JOIN customer c ON c.c_nationkey = n.n_nationkey
             |WHERE r.r_name = 'ASIA' ORDER BY c.c_custkey""".stripMargin)),

    // ---------------------------------------------------------------- G4
    // Reverse traversal (traverseSources, Graph.hs:79-80): part -> lineitem
    // sources. Filtered part side is small → AQE converts to broadcast.
    Q("g4_reverse_traversal",
      (s, d) => {
        val p = t(s, d, "part").filter(col("p_brand") === "Brand#13").select("p_partkey")
        t(s, d, "lineitem")
          .join(p, col("l_partkey") === col("p_partkey"))
          .select("l_suppkey")
          .distinct()
          .orderBy("l_suppkey")
      },
      Some("""SELECT DISTINCT l.l_suppkey FROM lineitem l
             |JOIN part p ON l.l_partkey = p.p_partkey
             |WHERE p.p_brand = 'Brand#13' ORDER BY l.l_suppkey""".stripMargin)),

    // ---------------------------------------------------------------- G5
    // getStats counts (#9, Graph.hs:82-118). Three independent count-only
    // scans (parquet row-group metadata makes these near-free), cross-joined
    // into one row.
    Q("g5_stats",
      (s, d) => {
        val c = t(s, d, "customer").agg(count(lit(1)).as("customers"))
        val o = t(s, d, "orders").agg(count(lit(1)).as("orders"))
        val l = t(s, d, "lineitem").agg(count(lit(1)).as("lineitems"))
        c.crossJoin(o).crossJoin(l)
      },
      Some("""SELECT (SELECT COUNT(*) FROM customer) AS customers,
             |(SELECT COUNT(*) FROM orders) AS orders,
             |(SELECT COUNT(*) FROM lineitem) AS lineitems""".stripMargin)),

    // ---------------------------------------------------------------- G6
    // Distinct traversal (visited-set dedup, Graph.hs:72-77).
    Q("g6_distinct_traversal",
      (s, d) =>
        t(s, d, "orders").agg(countDistinct(col("o_custkey")).as("cnt")),
      Some("SELECT COUNT(DISTINCT o_custkey) AS cnt FROM orders")),

    // ---------------------------------------------------------------- R1
    Q("r1_filter_project",
      (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_quantity") > 45)
          .select("l_orderkey", "l_linenumber")
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber FROM lineitem
             |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    // ---------------------------------------------------------------- R2
    Q("r2_hash_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sq"))
          .orderBy("l_returnflag", "l_linestatus"),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
             |ROUND(SUM(l_quantity), 2) AS sq FROM lineitem
             |GROUP BY l_returnflag, l_linestatus
             |ORDER BY l_returnflag, l_linestatus""".stripMargin)),

    // ---------------------------------------------------------------- R3
    // Top-k: orderBy+limit compiles to TakeOrderedAndProject — per-partition
    // heaps, no global sort. This is the plan that survives 100×.
    Q("r3_topk",
      (s, d) =>
        t(s, d, "orders")
          .select("o_orderkey", "o_totalprice")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)),

    // ---------------------------------------------------------------- R4
    Q("r4_semi_join",
      (s, d) => {
        val big = t(s, d, "orders")
          .filter(col("o_totalprice") > 300000).select("o_custkey")
        t(s, d, "customer")
          .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
          .select("c_custkey")
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey FROM customer WHERE c_custkey IN
             |(SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------------------- R5
    // Anti join = `remove` semantics (detach then vacuum, Graph.hs:126-127).
    // Both sides exclude NULL keys explicitly: SQL NOT IN returns ZERO
    // rows if the subquery contains any NULL, while left_anti ignores
    // NULLs — aligning the two keeps the pair equivalent even on data
    // with a nullable FK (TPC-H's non-null o_custkey merely masks it).
    Q("r5_anti_join",
      (s, d) =>
        // isNotNull on BOTH sides: left_anti keeps a NULL-keyed left row
        // (no match possible) while SQL's NOT IN drops it (NULL NOT IN
        // set = UNKNOWN) — filtering both engines to known keys makes the
        // pair equivalent by construction, not by the data's non-null luck
        t(s, d, "customer")
          .where(col("c_custkey").isNotNull)
          .join(t(s, d, "orders").select("o_custkey")
            .where(col("o_custkey").isNotNull),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer
             |WHERE c_custkey IS NOT NULL AND c_custkey NOT IN
             |(SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
             |ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------------------- R6
    Q("r6_union",
      (s, d) =>
        t(s, d, "nation").select(col("n_name").as("name"))
          .unionAll(t(s, d, "region").select(col("r_name").as("name")))
          .orderBy("name"),
      Some("""SELECT n_name AS name FROM nation UNION ALL
             |SELECT r_name FROM region ORDER BY name""".stripMargin)),

    // ---------------------------------------------------------------- R7
    // Window ranking. rnk cast to BIGINT to match DuckDB's ROW_NUMBER type.
    Q("r7_window_rank",
      (s, d) => {
        // order by ts_ns, the finest time grain the loader exposes: under a
        // TIMESTAMP(NANOS) fixture that is the raw ns long (DuckDB orders by
        // its ns-precision timestamp, and two events of one user within the
        // same microsecond would otherwise tie here while the oracle
        // separates them); under the current µs fixture ts_ns is
        // unix_micros·1000, so both engines tie at µs and fall to event_id
        // identically either way
        val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
        t(s, d, "events")
          .withColumn("rnk", row_number().over(w).cast("bigint"))
          .filter(col("rnk") <= 3)
          .select("user_id", "event_id", "rnk")
          .orderBy("user_id", "rnk")
      },
      Some("""SELECT user_id, event_id, rnk FROM
             |(SELECT user_id, event_id, ROW_NUMBER() OVER
             |(PARTITION BY user_id ORDER BY ts, event_id) AS rnk FROM events)
             |WHERE rnk <= 3 ORDER BY user_id, rnk""".stripMargin)),

    // ---------------------------------------------------------------- R8
    // Inverted-index build (search-term emission, Demo.hs:24-28):
    // explode(split) then count — exactly how the index DF derives multi-key
    // emissions from a value.
    Q("r8_explode_words",
      (s, d) =>
        t(s, d, "part")
          .select(explode(split(col("p_name"), " ")).as("word"))
          .groupBy("word")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word"))
          .limit(20),
      Some("""SELECT w AS word, COUNT(*) AS cnt FROM
             |(SELECT UNNEST(string_split(p_name, ' ')) AS w FROM part)
             |GROUP BY w ORDER BY cnt DESC, word LIMIT 20""".stripMargin)),

    // ---------------------------------------------------------------- R9
    Q("r9_time_window",
      (s, d) =>
        t(s, d, "events")
          .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
          .orderBy("h", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS cnt,
             |ROUND(SUM(value), 2) AS sv FROM events
             |GROUP BY h, event_type ORDER BY h, event_type""".stripMargin)),

    // ---------------------------------------------------------------- R10
    // Bench centerpiece: 3 fact joins + broadcast dim + agg.
    Q("r10_multiway_join_agg",
      (s, d) => {
        val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
        val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
        val l = t(s, d, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
        val n = t(s, d, "nation").select("n_nationkey", "n_name")
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
          .orderBy(col("rev").desc, col("n_name"))
      },
      Some("""SELECT n.n_name,
             |ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
             |FROM customer c
             |JOIN orders o ON c.c_custkey = o.o_custkey
             |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
             |JOIN nation n ON c.c_nationkey = n.n_nationkey
             |GROUP BY n.n_name ORDER BY rev DESC, n.n_name""".stripMargin)),

    // ---------------------------------------------------------------- R11
    // As-of join (temporal enrichment): every event matched to the latest
    // order of the same key at or before its timestamp — composed as a
    // tag-union + windowed last() (one shuffle, |L|+|R| rows; see
    // graft.queries.AsOf). Oracle: DuckDB's native ASOF JOIN. Output keeps
    // only deterministic columns (the matched DATE is unique even when
    // several same-day orders tie; the order id would not be).
    Q("r11_asof_join",
      (s, d) =>
        AsOf.asofJoin(
          left = t(s, d, "events").select("event_id", "user_id", "ts"),
          right = t(s, d, "orders"),
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          payload = Seq("o_orderdate"))
          .select(col("event_id"), col("user_id"), col("o_orderdate").as("asof_date"))
          .orderBy("event_id"),
      Some("""SELECT e.event_id, e.user_id, o.o_orderdate AS asof_date
             |FROM events e ASOF LEFT JOIN orders o
             |ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
             |ORDER BY e.event_id""".stripMargin)),

    // ---------------------------------------------------------------- R12
    // Multi-level aggregation: ROLLUP emits (flag, status), (flag), ()
    // grouping sets in ONE pass — partial hash-agg per set, no extra scans.
    // NULL grouping markers are coalesced to a sentinel so ordering and
    // hashing are engine-stable.
    Q("r12_rollup",
      (s, d) =>
        t(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sq"))
          .select(
            coalesce(col("l_returnflag"), lit("_all")).as("rf"),
            coalesce(col("l_linestatus"), lit("_all")).as("ls"),
            col("cnt"), col("sq"))
          .orderBy("rf", "ls"),
      Some("""SELECT COALESCE(l_returnflag, '_all') AS rf,
             |  COALESCE(l_linestatus, '_all') AS ls,
             |  COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS sq
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // ---------------------------------------------------------------- R13
    // Pivot: status columns per priority. Pivot values are declared
    // explicitly (F/O/P) so the plan is a single-pass pivot aggregate —
    // leaving them implicit costs an extra distinct-values job and makes
    // the output schema data-dependent.
    Q("r13_pivot",
      (s, d) =>
        t(s, d, "orders")
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .select(col("o_orderpriority"),
            coalesce(col("F"), lit(0L)).as("f_cnt"),
            coalesce(col("O"), lit(0L)).as("o_cnt"),
            coalesce(col("P"), lit(0L)).as("p_cnt"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS f_cnt,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS o_cnt,
             |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS p_cnt
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // ---------------------------------------------------------------- R14
    // Set operators beyond UNION: INTERSECT/EXCEPT (both distinct-ing),
    // tagged and unioned into one deterministic result.
    Q("r14_intersect_except",
      (s, d) => {
        val cn = t(s, d, "customer").select(col("c_nationkey").cast("long").as("n"))
        val sn = t(s, d, "supplier").select(col("s_nationkey").cast("long").as("n"))
        cn.intersect(sn).withColumn("tag", lit("both"))
          .unionByName(cn.except(sn).withColumn("tag", lit("cust_only")))
          .select("tag", "n").orderBy("tag", "n")
      },
      Some("""SELECT 'both' AS tag, n FROM
             |  (SELECT CAST(c_nationkey AS BIGINT) AS n FROM customer
             |   INTERSECT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
             |UNION ALL
             |SELECT 'cust_only' AS tag, n FROM
             |  (SELECT CAST(c_nationkey AS BIGINT) AS n FROM customer
             |   EXCEPT SELECT CAST(s_nationkey AS BIGINT) FROM supplier)
             |ORDER BY tag, n""".stripMargin)),

    // ---------------------------------------------------------------- R15
    // Exact interpolated percentiles per group (Spark percentile() ==
    // DuckDB quantile_cont): the curation primitive behind length/quality
    // cutoffs. Exact percentile sorts per group in the agg buffer;
    // at 100 TB swap in approx_percentile (t-digest) — same plan shape,
    // bounded memory.
    Q("r15_percentiles",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_returnflag")
          .agg(
            round(expr("percentile(l_quantity, 0.25)"), 2).as("q25"),
            round(expr("percentile(l_quantity, 0.5)"), 2).as("q50"),
            round(expr("percentile(l_quantity, 0.75)"), 2).as("q75"),
            round(expr("percentile(l_quantity, 0.95)"), 2).as("q95"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  ROUND(quantile_cont(l_quantity, 0.25), 2) AS q25,
             |  ROUND(quantile_cont(l_quantity, 0.5), 2) AS q50,
             |  ROUND(quantile_cont(l_quantity, 0.75), 2) AS q75,
             |  ROUND(quantile_cont(l_quantity, 0.95), 2) AS q95
             |FROM lineitem GROUP BY l_returnflag
             |ORDER BY l_returnflag""".stripMargin)),

    // ---------------------------------------------------------------- R16
    // Statistical aggregates: sample stddev + Pearson correlation per
    // group — single-pass co-moment aggregation in both engines. corr is
    // rounded at 4dp (unit scale), stddev at 2dp.
    Q("r16_stats_agg",
      (s, d) =>
        t(s, d, "lineitem")
          .groupBy("l_linestatus")
          .agg(
            round(stddev_samp(col("l_quantity")), 2).as("sd_qty"),
            round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"))
          .orderBy("l_linestatus"),
      Some("""SELECT l_linestatus,
             |  ROUND(stddev_samp(l_quantity), 2) AS sd_qty,
             |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp
             |FROM lineitem GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    // ---------------------------------------------------------------- R17
    // Range (banded) join: facts matched to a band dimension on a
    // half-open interval. The band side is broadcast, so the non-equi
    // condition never shuffles the fact table (BroadcastNestedLoop over 5
    // rows ≡ a scan-side filter). The classic scale alternative — join on
    // a computed bucket key — is what this degenerates to when the band
    // table is too big to broadcast.
    Q("r17_range_join",
      (s, d) => {
        import s.implicits._
        val bands = Seq((0, 10, "b0_xs"), (10, 20, "b1_s"), (20, 30, "b2_m"),
          (30, 40, "b3_l"), (40, 100, "b4_xl")).toDF("lo", "hi", "band")
        t(s, d, "lineitem")
          .join(broadcast(bands),
            col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("cnt"), round(sum("l_extendedprice"), 2).as("rev"))
          .orderBy("band")
      },
      Some("""SELECT band, COUNT(*) AS cnt,
             |  ROUND(SUM(l_extendedprice), 2) AS rev
             |FROM lineitem
             |JOIN (VALUES (0, 10, 'b0_xs'), (10, 20, 'b1_s'), (20, 30, 'b2_m'),
             |             (30, 40, 'b3_l'), (40, 100, 'b4_xl')) b(lo, hi, band)
             |  ON l_quantity >= lo AND l_quantity < hi
             |GROUP BY band ORDER BY band""".stripMargin)),

    // ---------------------------------------------------------------- R18
    // Date/time functions: calendar rollup by year/month with partition
    // pruning-friendly grouping keys.
    Q("r18_date_agg",
      (s, d) =>
        t(s, d, "orders")
          .groupBy(
            year(col("o_orderdate")).cast("bigint").as("yr"),
            month(col("o_orderdate")).cast("bigint").as("mo"))
          .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("tp"))
          .orderBy("yr", "mo"),
      Some("""SELECT EXTRACT(year FROM o_orderdate) AS yr,
             |  EXTRACT(month FROM o_orderdate) AS mo,
             |  COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS tp
             |FROM orders GROUP BY yr, mo ORDER BY yr, mo""".stripMargin)),

    // ---------------------------------------------------------------- R19
    // The SQL entry point end-to-end (SURVEY §3.4): temp views + one ANSI
    // query string executed VERBATIM by both Spark and the DuckDB oracle —
    // the strongest interop statement the declared set can make.
    Q("r19_sql_surface",
      (s, d) => {
        Seq("customer", "orders", "lineitem").foreach(tn =>
          t(s, d, tn).createOrReplaceTempView(tn))
        s.sql(Declared.r19Sql)
      },
      Some(Declared.r19Sql)),

    // ---------------------------------------------------------------- R20
    // Outer joins: FULL OUTER between per-nation customer and supplier
    // counts — both null sides exercised (nations with only one role).
    Q("r20_outer_join",
      (s, d) => {
        val c = t(s, d, "customer").groupBy(col("c_nationkey").cast("long").as("n"))
          .agg(count(lit(1)).as("c_cnt"))
        val sup = t(s, d, "supplier")
          .where(col("s_acctbal") > 8000)
          .groupBy(col("s_nationkey").cast("long").as("n"))
          .agg(count(lit(1)).as("s_cnt"))
        c.join(sup, Seq("n"), "full_outer")
          .select(col("n"), coalesce(col("c_cnt"), lit(0L)).as("c_cnt"),
            coalesce(col("s_cnt"), lit(0L)).as("s_cnt"))
          .orderBy("n")
      },
      Some("""SELECT COALESCE(c.n, s.n) AS n,
             |  COALESCE(c.c_cnt, 0) AS c_cnt, COALESCE(s.s_cnt, 0) AS s_cnt
             |FROM (SELECT CAST(c_nationkey AS BIGINT) AS n, COUNT(*) AS c_cnt
             |      FROM customer GROUP BY 1) c
             |FULL OUTER JOIN
             |     (SELECT CAST(s_nationkey AS BIGINT) AS n, COUNT(*) AS s_cnt
             |      FROM supplier WHERE s_acctbal > 8000 GROUP BY 1) s
             |ON c.n = s.n
             |ORDER BY n""".stripMargin)),

    // ---------------------------------------------------------------- R21
    // Regex + string functions: extract the trailing word of each part
    // name, uppercase it, count. Pattern kept in the common RE subset
    // (Java and DuckDB regex dialects agree on it).
    Q("r21_regexp",
      (s, d) =>
        t(s, d, "part")
          .select(upper(regexp_extract(col("p_name"), "(\\w+)$", 1)).as("last_word"))
          .where(col("last_word") =!= "")
          .groupBy("last_word").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("last_word")).limit(15),
      Some("""SELECT UPPER(regexp_extract(p_name, '(\w+)$', 1)) AS last_word,
             |  COUNT(*) AS cnt
             |FROM part
             |WHERE regexp_extract(p_name, '(\w+)$', 1) <> ''
             |GROUP BY 1 ORDER BY cnt DESC, last_word LIMIT 15""".stripMargin)),

    // ---------------------------------------------------------------- R22
    // Collection aggregation: per-region sorted name list. Emitted as a
    // joined string (sorted for determinism) so the cross-engine hash
    // compare is representation-independent.
    Q("r22_array_agg",
      (s, d) =>
        t(s, d, "nation")
          .groupBy(col("n_regionkey").cast("long").as("rk"))
          .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("names"))
          .orderBy("rk"),
      Some("""SELECT CAST(n_regionkey AS BIGINT) AS rk,
             |  array_to_string(list_sort(list(n_name)), ',') AS names
             |FROM nation GROUP BY 1 ORDER BY rk""".stripMargin)),

    // ---------------------------------------------------------------- R23
    // Semi-structured extraction: JSON path into the events.props payload,
    // aggregated — the schema-on-read shape every event pipeline has.
    Q("r23_json_extract",
      (s, d) => {
        // extract ONCE in a pre-aggregation project: referencing the
        // get_json_object expression from both aggregates would parse the
        // JSON twice per row — the parse dominates this query's cost
        val k = get_json_object(col("props"), "$.k").cast("bigint")
        graft.Tables.events(s, d)
          .select(col("event_type"), k.as("_k"))
          .groupBy("event_type")
          .agg(sum(col("_k")).as("sum_k"),
            count(when(col("_k") > 50, 1)).as("hi_cnt"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS hi_cnt
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // ---------------------------------------------------------------- R24
    // Sessionization as a batch query (gaps-and-islands): LAG to find
    // >30-min gaps, running sum of gap markers = session id, then per-user
    // session stats. The relational form of streaming/EventStreams
    // .sessionize — same gap rule, oracle-checkable.
    Q("r24_sessions",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        graft.Tables.events(s, d)
          .withColumn("_prev", lag(col("ts"), 1).over(w))
          .withColumn("_brk",
            when(col("_prev").isNull ||
              (unix_millis(col("ts")) - unix_millis(col("_prev"))) > 1800000L, 1L)
              .otherwise(0L))
          .withColumn("_sess", sum(col("_brk")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id")
          .agg(max(col("_sess")).as("sessions"),
            count(lit(1)).as("events"))
          .orderBy("user_id")
      },
      Some("""WITH o AS (
             |  SELECT user_id, event_id, ts,
             |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
             |  FROM events
             |), m AS (
             |  SELECT user_id, ts, event_id,
             |    CASE WHEN prev IS NULL
             |           OR epoch_ms(ts) - epoch_ms(prev) > 1800000 THEN 1
             |         ELSE 0 END AS brk
             |  FROM o
             |), sx AS (
             |  SELECT user_id,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
             |  FROM m)
             |SELECT user_id, CAST(MAX(sess) AS BIGINT) AS sessions,
             |  COUNT(*) AS events
             |FROM sx GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // --------------------------------------------------------------- R25
    // Ordered-funnel analysis: per user, the earliest view, the earliest
    // click strictly after it, and the earliest purchase strictly after
    // that — the classic conversion-funnel shape. Expressed as three
    // user-keyed min-aggregations chained by joins (every shuffle is on
    // user_id, the natural key; no per-user sort, no window over the whole
    // event stream), which is the form that survives a 10^9-user corpus.
    // Timestamps are exported as epoch-micros BIGINT so the oracle compare
    // is integer-exact.
    Q("r25_funnel",
      (s, d) => {
        val ev = graft.Tables.events(s, d)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("_us"))
        val v = ev.where(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("_us")).as("t_view"))
        val c = ev.where(col("event_type") === "click")
          .join(v, "user_id").where(col("_us") > col("t_view"))
          .groupBy("user_id").agg(min(col("_us")).as("t_click"))
        val p = ev.where(col("event_type") === "purchase")
          .join(c, "user_id").where(col("_us") > col("t_click"))
          .groupBy("user_id").agg(min(col("_us")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left")
          .join(p, Seq("user_id"), "left")
          .select(col("user_id"), col("t_view"), col("t_click"), col("t_purchase"))
          .orderBy("user_id")
      },
      Some("""WITH v AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS t_view
             |  FROM events WHERE event_type = 'view' GROUP BY user_id
             |), c AS (
             |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_click
             |  FROM events e JOIN v ON e.user_id = v.user_id
             |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t_view
             |  GROUP BY e.user_id
             |), p AS (
             |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS t_purchase
             |  FROM events e JOIN c ON e.user_id = c.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t_click
             |  GROUP BY e.user_id)
             |SELECT v.user_id, v.t_view, c.t_click, p.t_purchase
             |FROM v LEFT JOIN c ON v.user_id = c.user_id
             |       LEFT JOIN p ON v.user_id = p.user_id
             |ORDER BY v.user_id""".stripMargin)),

    // --------------------------------------------------------------- R26
    // Distribution windows: NTILE quartiles of order value WITHIN each
    // priority class, then per-(priority, quartile) count and value
    // bounds. The ordering key carries o_orderkey so tile assignment is
    // total-order deterministic in both engines. NOT the built-in ntile()
    // window: with 5 priority classes its parallelism is 5 and each task
    // sorts a fifth of the table (the 100× rehearsal measured 21× — the
    // round's one scale-killer). Distribution.ntileBucketed computes the
    // identical assignment with bucket prefix sums (rank window keyed by
    // (priority, value-bucket); DistributionSpec proves == ntile()).
    Q("r26_ntile_quartiles",
      (s, d) => {
        Distribution.ntileBucketed(t(s, d, "orders"),
          "o_orderpriority", "o_totalprice", "o_orderkey", tiles = 4)
          .withColumnRenamed("tile", "quartile")
          .groupBy("o_orderpriority", "quartile")
          .agg(count(lit(1)).as("cnt"),
            round(min(col("o_totalprice")), 2).as("lo"),
            round(max(col("o_totalprice")), 2).as("hi"))
          .orderBy("o_orderpriority", "quartile")
      },
      Some("""WITH q AS (
             |  SELECT o_orderpriority, o_totalprice,
             |    NTILE(4) OVER (PARTITION BY o_orderpriority
             |      ORDER BY o_totalprice, o_orderkey) AS quartile
             |  FROM orders)
             |SELECT o_orderpriority, CAST(quartile AS BIGINT) AS quartile,
             |  COUNT(*) AS cnt, ROUND(MIN(o_totalprice), 2) AS lo,
             |  ROUND(MAX(o_totalprice), 2) AS hi
             |FROM q GROUP BY o_orderpriority, quartile
             |ORDER BY o_orderpriority, quartile""".stripMargin)),

    // --------------------------------------------------------------- R28
    // Sliding event-time windows (2 h duration, 1 h slide) — r9 covers the
    // tumbling special case; overlap is the semantics watermarked stream
    // aggregations actually run with. Exactly the streaming operator
    // (EventStreams.slidingCounts serves batch and stream verbatim —
    // StreamingSpec proves parity); the oracle replays the two-window
    // membership by fanning each event to k ∈ {0, 1} hour offsets.
    Q("r28_sliding_window",
      (s, d) =>
        graft.streaming.EventStreams.slidingCounts(t(s, d, "events"))
          .orderBy("ws", "event_type"),
      Some("""WITH e AS (
             |  SELECT epoch_us(date_trunc('hour', ts)) AS h0,
             |    unnest([0, 1]) AS k, event_type, value
             |  FROM events)
             |SELECT h0 - k * 3600000000 AS ws, event_type,
             |  COUNT(*) AS cnt, ROUND(SUM(value), 2) AS sv
             |FROM e GROUP BY ws, event_type
             |ORDER BY ws, event_type""".stripMargin)),

    // --------------------------------------------------------------- R29
    // Bounded moving frame (ROWS BETWEEN 2 PRECEDING AND CURRENT ROW):
    // 3-day moving average of daily order revenue — the last window-frame
    // shape the declared set lacked (r7 rank, r24 lag + running sum, r26
    // ntile). The global ORDER BY window is legitimate HERE because its
    // input is the pre-aggregated daily table (date-cardinality rows, not
    // the fact table) — aggregate first, window over the aggregate is the
    // scale rule. Daily revenue is rounded BEFORE the frame so both
    // engines average identical inputs (kills the sum-order ulp class).
    Q("r29_moving_avg",
      (s, d) => {
        val daily = t(s, d, "orders")
          .groupBy(col("o_orderdate").as("d"))
          .agg(round(sum("o_totalprice"), 2).as("rev"))
        val w = Window.orderBy("d").rowsBetween(-2, Window.currentRow)
        daily.select(col("d"), col("rev"),
          round(avg(col("rev")).over(w), 2).as("ma3"))
          .orderBy("d")
      },
      Some("""WITH daily AS (
             |  SELECT o_orderdate AS d, ROUND(SUM(o_totalprice), 2) AS rev
             |  FROM orders GROUP BY o_orderdate)
             |SELECT d, rev,
             |  ROUND(AVG(rev) OVER (ORDER BY d
             |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
             |FROM daily ORDER BY d""".stripMargin)),

    // --------------------------------------------------------------- R27
    // CUBE: all four grouping combinations in one pass (r12 covers ROLLUP;
    // CUBE completes the grouping-sets family). The Expand operator feeds
    // one hash aggregate, so the lineitem scan happens exactly once.
    Q("r27_cube",
      (s, d) =>
        t(s, d, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("cnt"), round(sum("l_quantity"), 2).as("sq"))
          .select(
            coalesce(col("l_returnflag"), lit("_all")).as("rf"),
            coalesce(col("l_linestatus"), lit("_all")).as("ls"),
            col("cnt"), col("sq"))
          .orderBy("rf", "ls"),
      Some("""SELECT COALESCE(l_returnflag, '_all') AS rf,
             |  COALESCE(l_linestatus, '_all') AS ls,
             |  COUNT(*) AS cnt, ROUND(SUM(l_quantity), 2) AS sq
             |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
             |ORDER BY rf, ls""".stripMargin)),

    // ---------------------------------------------------------------- X1
    Q("x1_dedup_counts",
      (s, d) =>
        t(s, d, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("total"), countDistinct(col("text")).as("uniq"))
          .orderBy("lang"),
      Some("""SELECT lang, COUNT(*) AS total, COUNT(DISTINCT text) AS uniq
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // ---------------------------------------------------------------- X2
    Q("x2_text_stats",
      (s, d) =>
        t(s, d, "documents")
          .groupBy("source")
          .agg(round(avg(col("n_chars")), 2).as("avg_chars"))
          .orderBy("source"),
      Some("""SELECT source, ROUND(AVG(n_chars), 2) AS avg_chars
             |FROM documents GROUP BY source ORDER BY source""".stripMargin))
  )
}
