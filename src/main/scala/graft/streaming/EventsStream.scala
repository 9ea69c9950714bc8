package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the events stream (SURVEY.md §2.9 —
  * the reference is batch-only; its daily submissionDate loop is the manual
  * ancestor of this). Batch and stream share the same Column pipeline: every
  * transform here is also applied in batch mode by the q40-q42 queries, so
  * correctness is oracle-checked in batch and replay-checked in streaming
  * tests.
  *
  * Scale: file-source streaming reads incrementally (maxFilesPerTrigger);
  * watermarks bound state; session windows / dedup state live in the state
  * store keyed by (user, window) — partitioned by key, no driver state.
  */
object EventsStream {

  /** Replay a parquet events directory as a stream (file source requires an
    * explicit schema). */
  def fromDirectory(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 1): DataFrame = {
    val schema = spark.read.parquet(path).schema
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)
  }

  /** Tumbling 1-hour counts per event type with a 2-hour watermark.
    * Works identically on batch and streaming frames. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Gap-based session windows (30 min) per user. `watermark = None` keeps
    * all session state (only sane for bounded replays / batch; production
    * streams need the watermark so closed sessions leave the state
    * store). */
  def sessionWindows(events: DataFrame,
                     watermark: Option[String] = Some("2 hours")): DataFrame =
    watermark.fold(events)(events.withWatermark("ts", _))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"),
        col("n_events"))

  /** Streaming dedup on event_id within the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream self-join: pair each purchase with the same user's
    * signups within the preceding hour. Both sides carry watermarks and
    * the join condition bounds event time on both ends, so state is
    * evictable — the canonical interval-join shape. */
  def purchaseAfterSignup(events: DataFrame): DataFrame =
    purchaseAfterSignup(events, events)

  /** Two-source variant: `signupEvents` and `purchaseEvents` may be two
    * INDEPENDENT streaming sources — the true stream-stream join shape
    * (each side watermarked, the state store holding both sides' buffers
    * bounded by watermark + interval). Inner-join results emit eagerly
    * per micro-batch, so the complete replay equals the batch join —
    * the q169 contract. */
  def purchaseAfterSignup(signupEvents: DataFrame,
                          purchaseEvents: DataFrame): DataFrame = {
    val signups = signupEvents.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("signup_ts"))
      .withWatermark("signup_ts", "2 hours")
    val purchases = purchaseEvents.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    purchases.as("p").join(signups.as("s"),
      expr("""p.user_id = s.user_id AND
              purchase_ts >= signup_ts AND
              purchase_ts <= signup_ts + INTERVAL 1 HOUR"""))
      .select(col("p.user_id").as("user_id"), col("signup_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  // ---- custom state: running per-user counters via mapGroupsWithState ----

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserCounter(user_id: Long, n_events: Long, sum_value: Double)

  /** Arbitrary stateful aggregation — the streaming analog of the
    * reference's Counter-monoid keyed state (profile_daily.py:142-197):
    * per-user running totals held in the state store. */
  def runningUserCounters(spark: SparkSession, events: DataFrame): Dataset[UserCounter] = {
    import spark.implicits._
    events.select(col("user_id"), col("event_type"), col("value"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserCounter, UserCounter](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserCounter]) =>
          val prev = state.getOption.getOrElse(UserCounter(uid, 0L, 0.0))
          val merged = rows.foldLeft(prev) { (acc, e) =>
            UserCounter(uid, acc.n_events + 1, acc.sum_value + e.value)
          }
          state.update(merged)
          merged
      }
  }

  // ---- streaming as-of join: temporal state join via flatMapGroupsWithState

  case class TsEvent(user_id: Long, event_type: String,
                     ts: java.sql.Timestamp, event_id: Long, value: Double)
  case class AsOfMatch(user_id: Long, event_id: Long, purchase_us: Long,
                       purchase_value: Double, signup_us: Option[Long])

  /** Streaming twin of [[graft.ops.Joins.asOf]]: every purchase emitted
    * with the user's latest signup at-or-before it. Spark has no built-in
    * stream-stream as-of join (the interval join needs BOTH time bounds);
    * the custom-state form keeps exactly ONE long per user — the latest
    * signup time seen — because with per-batch event-time ordering the
    * nearest predecessor is just the running max. Rows are processed in
    * (ts, signup-before-purchase, event_id) order inside each batch, so
    * an equal-timestamp signup matches its purchase ("at or before").
    *
    * Out-of-order caveat (inherent to single-value state): a signup
    * arriving in a LATER micro-batch than a purchase it should have
    * matched is missed — the same contract as watermark-late data in the
    * built-in joins; replay in event-time order (as the specs do) and the
    * output equals the batch as-of join exactly. In batch execution each
    * group sees all rows at once, so the semantics are exact — that twin
    * is oracle-gated (q74). */
  /** Watermark-buffered out-of-order streaming as-of — the exactness
    * upgrade over [[streamingAsOf]]'s single-value state. Purchases are
    * BUFFERED in group state and a purchase is emitted only once the
    * event-time watermark has passed its timestamp: at that point no
    * signup at-or-before it can still arrive (the watermark contract), so
    * the match is final — the output equals the batch as-of join under
    * ANY micro-batch arrival order within the watermark delay, where the
    * single-value form silently misses late signups (both behaviors are
    * pinned in StreamingSpec).
    *
    * State is bounded: pending purchases leave as the watermark passes
    * them, and the signup list is compacted to the newest signup that can
    * still win for any future purchase (all future purchases arrive with
    * ts above the watermark, so among signups at-or-below the compaction
    * bound only the LATEST can ever be the nearest predecessor) plus the
    * ones above the bound. Flushing does not wait for new input: when
    * pending purchases exist, an event-time timeout is armed just past
    * the earliest one, and Spark's no-data micro-batches fire the group
    * as the watermark advances.
    *
    * Boundary: flush uses `watermark >= ts` — the complement of the
    * source dropping late rows at `ts < watermark` — so an equal-ts
    * signup must arrive in the same batch as its purchase (in-batch rows
    * are processed signup-first at equal ts, as in [[streamingAsOf]]).
    *
    * CONTRACT — same-millisecond ordering: ripeness is decided at the
    * watermark's own granularity (milliseconds; Spark watermarks carry no
    * sub-ms precision), so a purchase whose event time falls in the
    * watermark's current millisecond is finalized THEN — a signup with an
    * earlier microsecond timestamp inside that same millisecond arriving
    * in a LATER micro-batch is missed from the already-emitted match. In
    * a bounded replay this cannot happen (the terminal no-data batch pins
    * the watermark after all data is ingested — the deadlock rationale in
    * the flush comment); in a true unbounded stream, callers needing
    * sub-ms cross-batch ordering must tighten the flush to
    * `ts_ms < wm_ms` and accept that the corpus-final millisecond only
    * drains on a later watermark advance. */
  def streamingAsOfBuffered(spark: SparkSession, events: DataFrame,
                            delay: String = "2 hours"): Dataset[AsOfMatch] = {
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events
      .where(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .withWatermark("ts", delay)
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfBufState, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, rows: Iterator[TsEvent], state: GroupState[AsOfBufState]) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          var st = state.getOption.getOrElse(AsOfBufState(Vector.empty, Vector.empty))
          // ingest this batch (rows is empty on a pure timeout firing)
          val (sig, pur) = rows.toVector.partition(_.event_type == "signup")
          if (sig.nonEmpty || pur.nonEmpty)
            st = AsOfBufState(
              (st.signups ++ sig.map(e => us(e.ts))).sorted,
              st.pending ++ pur.map(e => PendingPurchase(e.event_id, us(e.ts), e.value)))
          // finalize purchases the watermark has passed, oldest first so
          // equal-ts purchases emit deterministically. Ripeness compares
          // at the watermark's OWN granularity (Spark watermarks are
          // milliseconds): a micro-precision ts_us <= wmUs test can never
          // pass for a purchase in the same millisecond as the corpus max
          // event time — the final no-data batch pins the watermark to
          // the ms-truncated max, so such a purchase (e.g. when the
          // globally latest event IS a purchase) would sit in state
          // forever.
          val (ripe, wait) = st.pending.partition(_.ts_us / 1000L <= wmUs / 1000L)
          val out = ripe.sortBy(p => (p.ts_us, p.event_id)).map { p =>
            val m = st.signups.takeWhile(_ <= p.ts_us)
            AsOfMatch(uid, p.event_id, p.ts_us, p.value,
              if (m.isEmpty) None else Some(m.last))
          }
          // compact: below bound keep only the newest signup (it dominates
          // older ones for every future purchase), above it keep all
          val bound = (wmUs +: wait.map(_.ts_us)).min
          val (below, above) = st.signups.partition(_ <= bound)
          st = AsOfBufState(below.takeRight(1) ++ above, wait)
          if (st.signups.isEmpty && st.pending.isEmpty) state.remove()
          else {
            state.update(st)
            if (wait.nonEmpty)
              state.setTimeoutTimestamp(
                math.max(wait.map(_.ts_us).min / 1000L + 1, wmUs / 1000L + 1))
          }
          out.iterator
      }
  }

  case class PendingPurchase(event_id: Long, ts_us: Long, value: Double)
  case class AsOfBufState(signups: Vector[Long], pending: Vector[PendingPurchase])

  def streamingAsOf(spark: SparkSession, events: DataFrame): Dataset[AsOfMatch] = {
    import spark.implicits._
    def us(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    events
      .where(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        col("value"))
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, AsOfMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TsEvent], state: GroupState[Long]) =>
          val sorted = rows.toIndexedSeq.sortBy(e =>
            (us(e.ts), if (e.event_type == "signup") 0 else 1, e.event_id))
          val out = Seq.newBuilder[AsOfMatch]
          var latest: Option[Long] = state.getOption
          sorted.foreach { e =>
            if (e.event_type == "signup")
              latest = Some(latest.fold(us(e.ts))(math.max(_, us(e.ts))))
            else
              out += AsOfMatch(uid, e.event_id, us(e.ts), e.value, latest)
          }
          latest.foreach(state.update)
          out.result().iterator
      }
  }
}
