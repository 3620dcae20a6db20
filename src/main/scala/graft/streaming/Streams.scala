package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming surface. The reference is strictly batch
  * ("streaming" in its README means pipelined I/O — SURVEY §2.C), so
  * this is north-star extension territory: watermarked tumbling-window
  * aggregation and custom session state via flatMapGroupsWithState.
  *
  * Every transform here is defined on an unbounded `DataFrame` and works
  * identically on a bounded one — the batch queries in
  * [[graft.operators.Eventing]] reuse them, which is what makes them
  * oracle-checkable (DuckDB can't run a stream, but the transform is the
  * same logical plan either way).
  */
object Streams {

  /** Batch-mode transformWithState preamble, callable on ANY session.
    * The driver contract lets an external caller hand
    * [[graft.SparkEntry.queries]] its own SparkSession, which may not
    * come from [[graft.Session.build]] — so the TWS queries must be
    * self-sufficient: (a) pin the RocksDB provider (the only one TWS
    * supports; identical to the Session.build default, so on
    * engine-built sessions this is a no-op — it can never diverge a
    * shared session's later streaming queries, the ADVICE-r12 leak;
    * on a foreign session the set persists, which is safe: RocksDB
    * serves every stateful operator and is the production
    * recommendation anyway); (b) touch the StreamingQueryManager so
    * the driver's StateStoreCoordinator RPC endpoint — registered
    * only when the manager is instantiated — exists for pure-batch
    * TWS execution. */
  def ensureTwsRuntime(s: SparkSession): Unit = {
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    s.streams.active
    ()
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp)

  /** Per-user running-session state: O(1), never the raw events. */
  final case class SessState(nEvents: Long, start: Long, end: Long)

  /** Per-key running stats — the q152 monoid (count, integer-cents sum,
    * event-time bounds) held as live streaming state. Integer cents keep
    * the merge exact at any batch/fold order, the same reason q152's
    * batch merge uses DECIMAL. */
  final case class UserStats(user_id: Long, n: Long, sum_cents: Long,
      min_t: Long, max_t: Long)

  /** Tumbling-window count/sum per event type. On a stream, pair with
    * [[withEventWatermark]] so state for closed windows is dropped —
    * unbounded state is the thing that kills a 100 TB/day stream. */
  def tumblingCounts(events: DataFrame, windowLen: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"), col("sum_value"))

  /** Native session windows: Spark's `session_window` grouping (the
    * built-in merging-session operator, distinct from the gap-RULE
    * sessionization [[sessionize]]/q39 implement by hand). Each event
    * opens a window `[ts, ts + gap)`; overlapping-or-touching windows
    * of the same key merge, so `window.start` is the first event time
    * and `window.end` is the LAST event time + gap — same membership as
    * the q39 lag-rule (new session ⟺ t − prev > gap) but with the
    * engine-managed merging state that makes it streamable: on a
    * stream, pair with [[withEventWatermark]] and the state store keeps
    * one (start, end, agg) triple per open session per key, merged and
    * evicted by watermark — never the events. Batch/stream duality as
    * [[tumblingCounts]]: this exact plan is the batch oracle for the
    * streaming run. */
  def sessionWindowCounts(events: DataFrame, gap: String): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"))

  /** [[sessionWindowCounts]] with a PER-EVENT gap expression (the
    * dynamic-gap overload): an interactive click tolerates a short
    * lull, a batch-ish event type a long one. Each event opens
    * `[ts, ts + gap(event))`; overlapping-or-touching windows merge,
    * so the session end is the MAX per-event end across the merged
    * set, not last-event + one gap — pinned in StreamingSpec with a
    * short-gap event inside a longer predecessor window. */
  def sessionWindowDynamic(events: DataFrame, gap: Column): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"))

  /** Hopping (sliding) windows: length > slide, so each event lands in
    * length/slide overlapping windows. Same batch/stream duality as
    * [[tumblingCounts]]. */
  def hoppingCounts(events: DataFrame, windowLen: String,
                    slide: String): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"))

  def withEventWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Event-time interval join: pair each click with the same user's
    * views in the preceding `gap`. On bounded inputs this is a plain
    * range-condition join; on two watermarked streams the SAME plan is
    * a stream-stream join whose state Spark bounds by the time range +
    * watermark (old rows are evicted — the property that keeps a
    * stream-stream join's state finite). Callers watermark the inputs
    * for the streaming case. */
  def intervalPairs(clicks: DataFrame, views: DataFrame,
                    gap: String = "5 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id"))
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("view_id"))
    c.join(v, col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $gap") &&
        col("v_ts") <= col("c_ts"))
      .select(col("click_id"), col("view_id"))
  }

  /** LEFT OUTER event-time interval join — a different state machine
    * than [[intervalPairs]]'s inner join: a click with no view in its
    * trailing window must still emit (with a null view_id), and on an
    * unbounded stream that decision is only safe once the WATERMARK
    * passes the click's window end — Spark holds the unmatched left row
    * in state and emits the null-padded result at expiry, so outer
    * results are correct-but-delayed by the lateness bound, never
    * speculative. Both inputs need watermarks and the time-range
    * condition bounds state on both sides. Batch mode is the plain
    * left outer join — the oracle for the streaming run. */
  def intervalPairsOuter(clicks: DataFrame, views: DataFrame,
                         gap: String = "5 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id"))
    val v = views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
      col("event_id").as("view_id"))
    c.join(v, col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr(s"INTERVAL $gap") &&
        col("v_ts") <= col("c_ts"), "left_outer")
      .select(col("click_id"), col("view_id"))
  }

  /** Exact dedup by event id, stream-safe: on an unbounded input the
    * dedup state is scoped to the watermark (`dropDuplicatesWithin
    * Watermark` — state for ids older than the watermark is dropped, so
    * state stays bounded by the lateness window instead of growing with
    * the stream); on a bounded input the same logical operation is a
    * plain `dropDuplicates`. Duplicates are exact row copies, so which
    * copy survives is unobservable. */
  def dedupEvents(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    if (events.isStreaming)
      events.withWatermark("ts", delay).dropDuplicatesWithinWatermark("event_id")
    else events.dropDuplicates("event_id")

  /** CHAINED stateful pipeline — watermark-scoped exact dedup feeding a
    * tumbling-window aggregate, two stateful operators in ONE streaming
    * query (multi-stateful support; before it, each stateful step
    * needed its own query + intermediate sink, doubling latency and
    * storage). The watermark is applied once at the dedup
    * ([[dedupEvents]]) and propagates through to scope BOTH state
    * stores: dedup ids older than the watermark are dropped AND closed
    * windows are emitted/evicted off the same clock. This is the
    * at-least-once ingestion shape at 100 TB/day — the transport
    * retries (Kafka redelivery, file re-lists) are collapsed by the
    * dedup BEFORE they can double-count a window, with state bounded
    * by the lateness horizon on both operators. Batch/stream duality
    * as everywhere in this module: the same composition over a bounded
    * frame is the oracle. */
  def dedupThenWindow(events: DataFrame, delay: String = "10 minutes",
      windowLen: String = "5 minutes"): DataFrame =
    tumblingCounts(dedupEvents(events, delay), windowLen)

  /** Stream-static enrichment join: attach a small static dimension to
    * an (unbounded or bounded) event frame. The static side is
    * broadcast — on a stream this is the ONLY join shape that needs no
    * state at all (each micro-batch joins against the same in-memory
    * table; nothing is buffered across batches), and at 100 TB/day it
    * keeps the event side shuffle-free. LEFT join: an event whose key
    * the dimension doesn't know yet (the normal CDC lag race) is kept
    * with null enrichment columns — an enrich step must never silently
    * drop events. */
  def enrichUsers(events: DataFrame, users: DataFrame): DataFrame =
    events.join(broadcast(users), Seq("user_id"), "left")

  /** Read the events table as a file stream (schema must be supplied —
    * streaming sources don't infer). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE, props STRING"
    spark.readStream.schema(schema).parquet(dir)
  }

  /** Stateful incremental per-user stats via mapGroupsWithState: each
    * micro-batch FOLDS its rows into the stored state — the live form
    * of q152's batch state merge, and the shape that keeps per-key
    * profile maintenance O(state) instead of O(history) on a
    * 100 TB/day stream. State per key is one [[UserStats]] row, never
    * events. NoTimeout is deliberate: profile state lives for the
    * key's lifetime; a TTL policy would hang off event-time timeouts
    * exactly like [[sessionize]]'s. */
  def incrementalStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserStats]) =>
          var s = state.getOption.getOrElse(
            UserStats(uid, 0L, 0L, Long.MaxValue, Long.MinValue))
          rows.foreach { e =>
            val t = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
            s = UserStats(uid, s.n + 1,
              s.sum_cents + math.round(e.value * 100),
              math.min(s.min_t, t), math.max(s.max_t, t))
          }
          state.update(s)
          s
      }
  }

  /** [[incrementalStats]] on Spark 4's `transformWithState` — the
    * successor arbitrary-state API (SPARK-40434's evolution) and the
    * one a new 100 TB pipeline should target: typed named state
    * primitives (`ValueState`/`ListState`/`MapState`) instead of one
    * opaque blob, per-state TTL, timers decoupled from output mode,
    * and schema-evolvable state backed by the RocksDB provider
    * (changelog-checkpointed — state snapshots stream incrementally
    * instead of full-file uploads, which is what keeps multi-TB state
    * checkpointable). Semantics here are IDENTICAL to
    * [[incrementalStats]] by construction — same fold, same state row
    * — and StreamingSpec pins the two APIs batch-equal on the same
    * multi-batch stream. State per key is one [[UserStats]] row;
    * TTLConfig.NONE mirrors NoTimeout (profile state for the key's
    * lifetime).
    */
  def incrementalStatsTws(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new StatsProcessor, TimeMode.None(),
        OutputMode.Update())
  }

  /** One LSH band row of a document's MinHash signature — the unit the
    * ingest-time near-dup detector ([[nearDupIngest]]) is keyed by. */
  final case class BandRow(doc_id: Long, band: Int, bsig: String)

  /** Per-(doc, band) verdict from [[nearDupIngest]]: `dup` = a doc
    * with a SMALLER doc_id occupies (or occupied) this band's bucket —
    * id-priority semantics, matching the batch backfill's
    * smaller-doc_id-wins self-join. Under the monotone-ingest norm
    * (doc_id order ≡ arrival order, the append-log contract
    * [[nearDupIngest]] documents) this coincides with "an
    * earlier-ingested doc already occupied the bucket"; when ingest is
    * NOT monotone in doc_id, the id rule governs: a small-id late
    * arrival into an occupied bucket is NOT flagged (it has priority),
    * and the larger-id occupant keeps the verdict it was emitted
    * with. */
  final case class BandHit(doc_id: Long, band: Int, dup: Boolean)

  /** Near-duplicate detection AT INGEST. The batch near-dup family
    * (q30/q49) re-derives candidates from a corpus snapshot; a 100 TB
    * ingest pipeline instead holds the LSH bucket occupancy as
    * STREAMING STATE and flags each arriving doc against everything
    * already ingested — no corpus re-clustering, one state probe per
    * band per doc. Keyed by (band, bsig); state per occupied bucket is
    * ONE long (the bucket's earliest occupant), so total state is
    * bounded by the number of distinct buckets ever hit — never the
    * corpus, never the signatures.
    *
    * Arrival order is the dedup priority (the first occupant of a
    * bucket is the survivor). Within one micro-batch a bucket's rows
    * arrive unordered, so the processor sorts the batch's ids and
    * applies the same earliest-wins rule — which makes the flagged set
    * INVARIANT to micro-batch boundaries whenever ingest order is
    * monotone in doc_id (the append-log norm): "already ingested" is
    * then exactly "smaller doc_id", the policy a batch backfill states
    * as a band self-join. StreamingSpec pins that invariance on a real
    * multi-batch stream vs the one-batch backfill. */
  def nearDupIngest(bands: Dataset[BandRow]): Dataset[BandHit] = {
    import bands.sparkSession.implicits._
    bands.groupByKey(b => (b.band, b.bsig))
      .transformWithState(new NearDupProcessor, TimeMode.None(),
        OutputMode.Append())
  }

  /** Bucket-occupancy processor for [[nearDupIngest]]: ValueState =
    * the smallest doc_id ever seen in this (band, bsig) bucket.
    * Transient memory per key is the batch's ids for that bucket
    * (8 B each — the in-batch earliest-wins rule needs the batch's
    * minimum before any verdict can be emitted), bounded by the
    * micro-batch admission size, never the corpus; persistent state
    * stays one long regardless. */
  private[streaming] class NearDupProcessor
      extends StatefulProcessor[(Int, String), BandRow, BandHit] {
    @transient private var minSeen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      minSeen = getHandle.getValueState[Long]("min_seen",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: (Int, String), rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[BandHit] = {
      val ids = rows.map(_.doc_id).toArray
      java.util.Arrays.sort(ids)
      val prior = if (minSeen.exists()) minSeen.get() else Long.MaxValue
      val floor = math.min(prior, ids(0))
      minSeen.update(floor)
      ids.iterator.map(id => BandHit(id, key._1, id > floor))
    }
  }

  /** Per-user running-stats processor for [[incrementalStatsTws]]:
    * folds each batch's rows into a single `ValueState[UserStats]` and
    * emits the updated row. */
  private[streaming] class StatsProcessor
      extends StatefulProcessor[Long, Event, UserStats] {
    @transient private var st: ValueState[UserStats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[UserStats]("stats",
        org.apache.spark.sql.Encoders.product[UserStats], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserStats] = {
      var s =
        if (st.exists()) st.get()
        else UserStats(uid, 0L, 0L, Long.MaxValue, Long.MinValue)
      rows.foreach { e =>
        val t = e.ts.getTime * 1000 + (e.ts.getNanos / 1000) % 1000
        s = UserStats(uid, s.n + 1,
          s.sum_cents + math.round(e.value * 100),
          math.min(s.min_t, t), math.max(s.max_t, t))
      }
      st.update(s)
      Iterator.single(s)
    }
  }

  /** Custom stateful operator: gap-based sessionization with
    * flatMapGroupsWithState. A session closes when the next event of the
    * same user arrives > `gapSec` later, or when the event-time WATERMARK
    * passes sessionEnd + gap (event-time timeout — deterministic and
    * replay-safe, unlike a processing-time timer, and it never triggers
    * empty busy-loop batches). State per user is O(1) — only the running
    * session aggregate is kept, never the events.
    */
  def sessionize(events: Dataset[Event], gapSec: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(Session(userId, s.nEvents,
          new Timestamp(s.start), new Timestamp(s.end)))
      }
      var cur = state.getOption.orNull
      val closed = Seq.newBuilder[Session]
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        cur match {
          case null =>
            cur = SessState(1, t, t)
          case s if t - s.end > gapSec * 1000 =>
            closed += Session(userId, s.nEvents,
              new Timestamp(s.start), new Timestamp(s.end))
            cur = SessState(1, t, t)
          case s =>
            cur = SessState(s.nEvents + 1, s.start, math.max(s.end, t))
        }
      }
      if (cur != null) {
        state.update(cur)
        // must be strictly beyond the current watermark or Spark rejects it
        state.setTimeoutTimestamp(math.max(cur.end + gapSec * 1000,
          state.getCurrentWatermarkMs() + 1))
      }
      closed.result().iterator
    }

    events.withWatermark("ts", watermarkDelay).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Watermark-loss audit: a DETERMINISTIC batch replay of append-mode
    * watermark semantics over a declared arrival order, quantifying per
    * tumbling window how many events a given watermark delay would
    * drop as late — the number an operator needs before picking a delay
    * for a 100 TB/day stream (too short silently loses data; too long
    * holds state and latency).
    *
    * Arrival model: events land in `sliceUs`-wide event-time ingest
    * slices (micro-batch b = ts div sliceUs), except a delayed cohort —
    * `user_id % lateMod == 0`, the clients that sync late — whose
    * events arrive one slice later. Spark's engine rules are replayed
    * exactly: the watermark after batch b is the running max event time
    * over batches ≤ b, FLOORED TO MILLISECONDS (EventTimeStats tracks
    * ms), minus the delay; a row arriving in batch b is dropped iff its
    * window END is at or before the watermark in force during b (the
    * one computed after b-1); a window is closed (emitted in append
    * mode) once the final watermark passes its end.
    *
    * The per-batch table is metadata-scale (corpus span / sliceUs —
    * ~120 rows for the fixture month), so its single-partition running
    * max windows over AGGREGATED rows, never over the event stream;
    * events join it broadcast. `WatermarkReplaySpec` holds this
    * simulation to the real engine: the same arrival order replayed
    * file-by-file through a watermarked append-mode stream must emit
    * exactly the closed windows' kept counts.
    */
  def watermarkAudit(events: DataFrame, sliceUs: Long, delayUs: Long,
      windowUs: Long, lateMod: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = events
      .select(unix_micros(col("ts")).as("t"), col("user_id"))
      .withColumn("b", expr(s"t div $sliceUs") +
        when(pmod(col("user_id"), lit(lateMod)) === 0, 1L).otherwise(0L))
      .withColumn("ws", expr(s"(t div $windowUs) * $windowUs"))
    val perBatch = e.groupBy("b").agg(max(col("t")).as("mx"))
    val ord = Window.orderBy("b")
    val wm = perBatch
      .withColumn("runmax", max(col("mx")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // ms floor first: the engine's watermark is ms-resolution, and a
      // window end can land inside the truncated sub-ms gap
      .withColumn("wm_after", expr(s"(runmax div 1000) * 1000 - $delayUs"))
      .withColumn("wm_before", lag(col("wm_after"), 1).over(ord))
      .select(col("b"), col("wm_before"))
    val finalWm = e.agg(
      expr(s"(max(t) div 1000) * 1000 - $delayUs").as("final_wm"))
    e.join(broadcast(wm), "b")
      .withColumn("late", when(col("wm_before").isNotNull &&
        col("ws") + windowUs <= col("wm_before"), 1L).otherwise(0L))
      .groupBy(col("ws"))
      .agg(count(lit(1)).as("n_total"), sum(col("late")).as("n_dropped"))
      .crossJoin(broadcast(finalWm))
      .select(
        date_format(timestamp_micros(col("ws")),
          "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("n_total"), col("n_dropped"),
        (col("n_total") - col("n_dropped")).as("n_kept"),
        (col("ws") + windowUs <= col("final_wm")).as("closed"))
  }
}
