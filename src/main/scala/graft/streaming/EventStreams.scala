package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` stream table — the
  * event-time side the reference lacks entirely (its WAL is an op stream
  * with buffered async apply, /root/reference/library/GraphDB/Persistent.hs:108-117
  * and Util/IOQueue.hs:20-48, but has no notion of event time, windows, or
  * watermarks). Here the same workloads run as real streams:
  *
  *  - [[hourlyCounts]]: tumbling event-time window + watermark — the
  *    streaming form of declared query R9; at scale this is the canonical
  *    shuffle-once windowed aggregation with late-data bounds.
  *  - [[sessionize]]: per-user session windows via
  *    `flatMapGroupsWithState` — custom state machine with processing-time
  *    timeouts, the `KeyValueGroupedDataset` state API.
  *
  * All sources are file streams (parquet), so the same code ingests a
  * directory that a producer keeps appending to — `Trigger.AvailableNow`
  * in tests, continuous micro-batches in production.
  */
object EventStreams {

  /** The events parquet schema as stored (ts = TIMESTAMP_MICROS with no
    * tz → TIMESTAMP_NTZ; file streams need an explicit schema). Earlier
    * fixture generations stored TIMESTAMP(NANOS) — batch reads adapt via
    * Tables.nanosToTs, but a file stream pins the declared type, so this
    * schema tracks the current fixture.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampNTZType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming read of an events directory with the ts normalization
    * applied (mirrors graft.Tables.events for batch — same shared helper,
    * so batch and streaming can never drift).
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.nanosToTs(spark.readStream.schema(rawSchema).parquet(dir))

  /** Tumbling 1-hour event-time windows with a watermark: counts + sums per
    * (window, event_type). Output mode append emits a window once the
    * watermark passes it — bounded state at any scale.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("cnt"), col("sv"))

  /** Sliding event-time windows — duration 2 h, slide 1 h: every event
    * contributes to TWO overlapping windows (tumbling is the slide ==
    * duration special case, hourlyCounts above). Window starts are
    * exported as epoch-micros BIGINT so the r28 oracle compare is
    * integer-exact. The same code serves batch (watermark is a no-op)
    * and a watermarked stream (StreamingSpec parity test); state per key
    * stays bounded because the watermark closes windows 2 h after their
    * end.
    *
    * Scale: window() is a per-row generator (2 rows out per event), and
    * the aggregation map-side combines to (window, type) cells — the
    * shuffle payload is window-count-sized, not event-count-sized.
    */
  def slidingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "2 hours", "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sv"))
      .select(unix_micros(col("window.start")).as("ws"),
        col("event_type"), col("cnt"), col("sv"))

  /** Stream-stream interval join: each click matched to the same user's
    * purchases within `withinMinutes` AFTER it. Both sides carry
    * watermarks and the join condition bounds event time on both ends, so
    * the state store evicts rows once the watermark passes — the only
    * shape under which unbounded stream-stream join state stays bounded.
    */
  def clickPurchaseJoin(clicks: DataFrame, purchases: DataFrame,
      withinMinutes: Int, watermark: String = "2 hours"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id")).withWatermark("c_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id")).withWatermark("p_ts", watermark)
    c.join(p,
      col("c_user") === col("p_user") &&
        col("p_ts") >= col("c_ts") &&
        col("p_ts") <= col("c_ts") + expr(s"INTERVAL $withinMinutes MINUTES"))
      .select(col("c_user").as("user_id"), col("click_id"),
        col("purchase_id"), col("c_ts"), col("p_ts"))
  }

  /** Streaming exact dedup on event_id, watermark-bounded: a duplicate
    * arriving within `watermark` of the first occurrence is dropped, and
    * dedup state older than the watermark is evicted — the property that
    * makes streaming dedup viable at scale (plain `dropDuplicates` on an
    * unbounded stream accumulates state forever; this is the streaming
    * form of pipeline op px1/Dedup.exact).
    */
  def dedupEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  final case class SessionAgg(user_id: Long, events: Long, start: java.sql.Timestamp,
      end: java.sql.Timestamp)
  // public: the streaming state encoder's generated code instantiates it
  final case class SessionState(events: Long, startMs: Long, lastMs: Long)

  /** Sessionization: events of one user belong to one session while gaps
    * stay under `gapMinutes`; a session is emitted when the gap is exceeded
    * (or the group times out). Custom state via flatMapGroupsWithState —
    * the engine-managed-state path that scales state to the store backend
    * (RocksDB in prod), not executor heap.
    */
  def sessionize(events: Dataset[Ev], gapMinutes: Int): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: flush the open session and drop the state —
            // without this, every user's final session is lost and state
            // grows unboundedly on a live stream
            val st = state.get
            state.remove()
            Iterator.single(SessionAgg(user, st.events,
              new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.lastMs)))
          } else {
            val sorted = evs.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.getOrElse(SessionState(0, -1, -1))
            val closed = scala.collection.mutable.ArrayBuffer[SessionAgg]()
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (st.events == 0) st = SessionState(1, t, t)
              else if (t - st.lastMs <= gapMs)
                // min/max bounds: a LATE event (prior micro-batch already
                // advanced lastMs past t) merges into the open session
                // without rewinding its end below its start — retroactive
                // re-sessionization of already-emitted sessions is out of
                // scope, as in any append-mode streaming sessionizer
                st = st.copy(events = st.events + 1,
                  startMs = math.min(st.startMs, t),
                  lastMs = math.max(st.lastMs, t))
              else {
                closed += SessionAgg(user, st.events,
                  new java.sql.Timestamp(st.startMs), new java.sql.Timestamp(st.lastMs))
                st = SessionState(1, t, t)
              }
            }
            state.update(st)
            if (state.getOption.isDefined)
              state.setTimeoutDuration(math.max(gapMs, 1L))
            closed.iterator
          }
      }
  }
}
