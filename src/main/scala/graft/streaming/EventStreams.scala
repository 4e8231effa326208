package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming pipelines over the events schema — the
  * streaming twins of graft.operators.Events (identical semantics,
  * verified against the batch forms in StreamingSpec).
  *
  * At scale: watermarks bound state; the windowed aggregation state is
  * |windows x types|; session state is one small object per active
  * user key, dropped on event-time timeout.
  */
object EventStreams extends Serializable {

  /** Tumbling 1h windowed counts with a 2h watermark — streaming form
    * of Events.evt01WindowedCounts. A tumbling window IS a sliding
    * window whose slide equals its length, so this delegates. */
  def windowedCounts(events: DataFrame): DataFrame =
    slidingCounts(events, "1 hour", "1 hour")

  /** Windowed HEAVY HITTERS on a stream: the mergeable Misra-Gries
    * sketch (graft.plans.FrequentItemsSketch, rel14's aggregate) as a
    * streaming aggregation — per tumbling window, the top-k item
    * table with deterministic [count_lb, count_ub] bounds. Because
    * the sketch's partial buffers merge associatively, it drops into
    * a watermarked streaming aggregate unchanged: the state store
    * holds ONE capacity-bounded buffer per open window, never the
    * item stream — the same reason the sketch scales in batch
    * (capacity counters per partition) makes its streaming state
    * O(capacity) per window. With capacity >= the distinct-item
    * count the sketch degenerates to exact counts (rel14's pinned
    * property), so cross-micro-batch merge order cannot perturb the
    * result — the spec asserts streaming == batch on that regime.
    * Works identically in batch for backfill. */
  def windowedHeavyHitters(
      events: DataFrame,
      capacity: Int = 64,
      k: Int = 5
  ): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("win"))
      .agg(
        graft.plans.FrequentItemsSketch(col("event_type"), capacity, k).as("top"))
      .select(col("win.start").as("window_start"),
        posexplode(col("top")).as(Seq("pos", "entry")))
      .select(
        col("window_start"),
        (col("pos") + 1).cast("long").as("rank"),
        col("entry.item").as("item"),
        col("entry.count_lb").as("count_lb"),
        col("entry.count_ub").as("count_ub")
      )

  /** Streaming conversion FUNNEL — evt04's twin: per user the first
    * view/click/purchase instants plus a `converted` verdict (strict
    * funnel order). min(when(...)) is a mergeable aggregate, so the
    * funnel runs as a plain streaming aggregation: state is three
    * timestamps per user (not the event stream), and partial mins
    * merge across micro-batches in the state store.
    *
    * The verdict is an emitted COLUMN, not a filter, and that is
    * load-bearing for update mode: a late out-of-order event can
    * FLIP a user's verdict (a click@1 arriving after view@2 →
    * click@3 → purchase@4 already emitted converted=true), and a
    * filter-after-aggregation has no way to retract the row it
    * already emitted — the sink would report the stale conversion
    * forever. With the verdict on the row, every state change
    * re-emits the user's current truth, so an upsert sink keyed on
    * user_id always converges. Batch twin contract:
    * funnel(df).filter(converted) == evt04Funnel (spec-asserted). */
  def funnel(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        min(when(col("event_type") === "click", col("ts"))).as("first_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("first_purchase")
      )
      .withColumn(
        "converted",
        col("first_view").isNotNull &&
          col("first_click").isNotNull &&
          col("first_purchase").isNotNull &&
          col("first_view") < col("first_click") &&
          col("first_click") < col("first_purchase")
      )

  /** Stream-static enrichment: the event stream joined to a static
    * dimension (broadcast per micro-batch — the standard pattern for
    * dimension lookups in a streaming pipeline). */
  def enrichWithDim(
      events: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String
  ): DataFrame =
    events.join(
      org.apache.spark.sql.functions.broadcast(dim),
      events(streamKey) === dim(dimKey),
      "left"
    )

  /** Sliding (hopping) event-time windows: each event lands in
    * window/slide overlapping windows — the smoothing shape between a
    * tumbling aggregate (evt01) and a row-window moving average
    * (evt06). Watermark bounds state to the horizon + window span;
    * state size is |open windows x types|, independent of stream
    * length. Works identically in batch for backfill (the spec runs
    * both and asserts equality). */
  def slidingCounts(
      events: DataFrame,
      windowLen: String = "2 hours",
      slide: String = "1 hour"
  ): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(
        window(col("ts"), windowLen, slide).getField("start").as("window_start"),
        col("event_type")
      )
      .agg(
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("sum_value")
      )

  /** Stream-stream interval join with watermarks bounding BOTH
    * sides' state: views matched to clicks by the same user where the
    * click lands within `withinMinutes` after the view. The time-range
    * predicate is what lets the engine age out join state — without
    * it a stream-stream join buffers forever. State per side is the
    * watermark horizon + interval, independent of stream length. */
  def viewClickJoin(events: DataFrame, withinMinutes: Int = 60): DataFrame = {
    val views = events
      .filter(col("event_type") === "view")
      .select(
        col("user_id"),
        col("event_id").as("view_id"),
        col("ts").as("view_ts")
      )
      .withWatermark("view_ts", "2 hours")
    val clicks = events
      .filter(col("event_type") === "click")
      .select(
        col("user_id").as("click_user"),
        col("event_id").as("click_id"),
        col("ts").as("click_ts")
      )
      .withWatermark("click_ts", "2 hours")
    views
      .join(
        clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr(s"INTERVAL $withinMinutes MINUTES")
      )
      .select(col("user_id"), col("view_id"), col("view_ts"), col("click_id"), col("click_ts"))
  }

  /** Streaming exact dedup: watermark-bounded dropDuplicates on a
    * content key — the streaming twin of Dedup.dedup01/02 (state
    * holds one entry per distinct key inside the watermark horizon,
    * then ages out). */
  def dedupEvents(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicates(keyCols :+ "ts")

  /** Instant keeps microsecond precision through the Encoder —
    * java.sql.Timestamp.getTime would floor to milliseconds and
    * diverge from the batch operator. */
  case class Evt(event_id: Long, ts: Instant, user_id: Long,
                 event_type: String, value: Double)

  /** start/last are epoch MICROS. */
  case class SessionState(start: Long, last: Long, n: Long)

  case class Session(user_id: Long, session_start: Instant,
                     session_end: Instant, n_events: Long,
                     duration_secs: Double)

  private def micros(i: Instant): Long =
    i.getEpochSecond * 1000000L + i.getNano / 1000L

  private def instant(us: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(us, 1000000L),
      Math.floorMod(us, 1000000L) * 1000L)

  /** Gap-based sessionization via flatMapGroupsWithState with
    * event-time timeout — streaming form of Events.evt02Sessionization.
    * Emits a session when the gap elapses (timeout) or a new event
    * arrives past the gap. Gap decisions use millisecond floors,
    * matching the batch operator's unix_millis arithmetic. */
  def sessionize(events: Dataset[Evt], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def finish(userId: Long, s: SessionState): Session =
      Session(
        userId,
        instant(s.start),
        instant(s.last),
        s.n,
        (s.last / 1000L - s.start / 1000L) / 1000.0
      )

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout
      ) { (userId: Long, rows: Iterator[Evt], state: GroupState[SessionState]) =>
        if (state.hasTimedOut) {
          val out = state.getOption.map(finish(userId, _))
          state.remove()
          out.iterator
        } else {
          val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          sorted.foreach { e =>
            val t = micros(e.ts)
            cur match {
              case Some(s) if t / 1000L - s.last / 1000L <= gapMs =>
                cur = Some(s.copy(last = t, n = s.n + 1))
              case Some(s) =>
                closed += finish(userId, s)
                cur = Some(SessionState(t, t, 1))
              case None =>
                cur = Some(SessionState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.last / 1000L + gapMs)
          }
          closed.iterator
        }
      }
  }

  /** Per-user latest-view state (ts in epoch micros). */
  case class LastView(view_id: Long, view_ts: Long)

  case class AsofMatch(purchase_id: Long, user_id: Long,
                       purchase_ts: Instant,
                       matched_view_id: Option[Long],
                       matched_view_ts: Option[Instant],
                       gap_us: Option[Long])

  /** Streaming as-of enrichment — the stateful twin of
    * Events.evt07AsofJoin: each purchase is matched to the user's
    * last view at-or-before it. State is ONE (view_id, ts) pair per
    * user — constant per key, no retained event history — which is
    * why the streaming form scales where a stream-stream interval
    * join would buffer the whole view stream. Within a batch, events
    * are sorted by (ts, kind, event_id) with views before purchases
    * on ties, matching the batch window's ORDER BY exactly. */
  def asofEnrich(events: Dataset[Evt]): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .filter(e => e.event_type == "view" || e.event_type == "purchase")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(),
        GroupStateTimeout.NoTimeout
      ) { (userId: Long, rows: Iterator[Evt], state: GroupState[LastView]) =>
        val sorted = rows.toSeq.sortBy { e =>
          (micros(e.ts), if (e.event_type == "view") 0 else 1, e.event_id)
        }
        var cur = state.getOption
        val out = scala.collection.mutable.ArrayBuffer.empty[AsofMatch]
        sorted.foreach { e =>
          if (e.event_type == "view") {
            // Running MAX under out-of-order arrival: a view landing in
            // a LATER batch with an OLDER (ts, event_id) than the stored
            // state must not win, or the stream diverges from the batch
            // evt07AsofJoin ordering it twins.
            val k = (micros(e.ts), e.event_id)
            if (cur.forall(v => Ordering[(Long, Long)].gteq(k, (v.view_ts, v.view_id))))
              cur = Some(LastView(e.event_id, micros(e.ts)))
          } else
            out += AsofMatch(
              e.event_id,
              userId,
              e.ts,
              cur.map(_.view_id),
              cur.map(v => instant(v.view_ts)),
              cur.map(v => micros(e.ts) - v.view_ts)
            )
        }
        cur.foreach(state.update)
        out.iterator
      }
  }
}
