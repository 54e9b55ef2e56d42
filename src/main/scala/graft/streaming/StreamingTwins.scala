package graft.streaming

import graft.rc.Esn
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Structured Streaming twins of the §2.8/§2.10 batch-equivalent operators.
  * Each takes an (unbounded or bounded) events DataFrame with columns
  * (event_id long, ts timestamp, user_id long, event_type string,
  * value double) and returns the incremental formulation.
  * StreamingTwinSpec asserts twin(stream) == batch result on the same rows.
  *
  * Scale notes: these are the true 100 TB streaming path — state is O(keys ×
  * window), not O(rows): tumbling/session aggs keep per-window partials in
  * the StateStore and the watermark bounds retention; the ESN twin keeps one
  * 32-float state vector per key (`flatMapGroupsWithState`), the exact
  * streaming-native formulation of the reference's keyed reservoir update.
  */
object StreamingTwins {

  /** Tumbling 1-hour event-time window (complete-mode comparable). */
  def tumbling1h(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_val"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"),
        col("sum_val"))

  /** Session window, 30-minute gap, per user. */
  def session30m(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        (sum(round(col("value") * 100).cast("long")) / 100.0).as("sum_val"))
      .select(col("user_id"), col("session_window.start").as("sess_start"),
        col("n_events"), col("sum_val"))

  /** First event per (user, type, minute) — streaming dedup. With a
    * watermark this becomes `dropDuplicatesWithinWatermark` (bounded state);
    * the unbounded form is used for exact twin comparison in tests.
    */
  def dedupFirst(events: DataFrame): DataFrame =
    events
      .withColumn("minute_bucket", date_trunc("minute", col("ts")))
      .dropDuplicates("user_id", "event_type", "minute_bucket")

  /** Tumbling window with a 10-minute watermark (append mode) — the
    * production form of tumbling1h with bounded state.
    */
  def tumbling1hWatermarked(events: DataFrame): DataFrame =
    tumbling1h(events.withWatermark("ts", "10 minutes"))

  final case class EsnIn(event_id: Long, tsUs: Long, user_id: Long,
      value: Double)
  final case class EsnState(x: Array[Double], step: Long)
  final case class EsnOut(user_id: Long, step: Long, event_id: Long,
      x0: Double, x1: Double)

  /** The same keyed reservoir update on the `transformWithState` API
    * (Spark 4 arbitrary-state v2; requires the RocksDB state store
    * provider) — typed ValueState per key, identical semantics to the
    * `flatMapGroupsWithState` twin below (asserted in StreamingTwinSpec).
    */
  class EsnProcessor(m: Esn.Mats)
      extends StatefulProcessor[Long, EsnIn, EsnOut] {
    @transient private var st: ValueState[EsnState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EsnState]("esn",
        Encoders.product[EsnState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[EsnIn],
        tv: TimerValues): Iterator[EsnOut] = {
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.event_id))
      val cur =
        if (st.exists()) st.get()
        else EsnState(new Array[Double](Esn.Nx), 0L)
      var x = cur.x
      var step = cur.step
      val out = sorted.map { r =>
        x = Esn.step(m, x, r.value / Esn.InputScale)
        step += 1
        EsnOut(uid, step - 1, r.event_id, x(0), x(1))
      }
      st.update(EsnState(x, step))
      out.iterator
    }
  }

  def esnStatesTws(in: Dataset[EsnIn], m: Esn.Mats): Dataset[EsnOut] =
    in.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new EsnProcessor(m), TimeMode.None(),
        OutputMode.Append())(Encoders.product[EsnOut])

  final case class RlsState(x: Array[Double], pending: Array[Double],
      p: Array[Double], w: Array[Double], n: Long)
  final case class RlsOut(user_id: Long, step: Long, w0: Double, w1: Double)

  /** Online RLS readout per key on `transformWithState` — the streaming
    * twin of `rc_readout_rls`: the reservoir fold and the O(d²) RLS state
    * (inverse-Gram P + weights) are carried across micro-batches in one
    * typed ValueState; each arriving value first serves as the TARGET of
    * the previous step's design row (one RLS update, one emitted weight
    * snapshot), then extends the reservoir state. Bounded state per key
    * ((2+Nx)² + O(Nx) doubles), the requirement for unbounded streams —
    * and, per Rls's scaladoc, the emitted weights equal the batch ridge
    * solution over the processed prefix at every step.
    */
  class RlsProcessor(m: Esn.Mats, lambda: Double)
      extends StatefulProcessor[Long, EsnIn, RlsOut] {
    @transient private var st: ValueState[RlsState] = _
    private val d = 2 + Esn.Nx

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[RlsState]("rls",
        Encoders.product[RlsState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[EsnIn],
        tv: TimerValues): Iterator[RlsOut] = {
      val sorted = rows.toArray.sortBy(r => (r.tsUs, r.event_id))
      val cur =
        if (st.exists()) st.get()
        else RlsState(new Array[Double](Esn.Nx), Array.empty,
          graft.rc.Rls.init(d, lambda).p, new Array[Double](d), 0L)
      var x = cur.x
      var pending = cur.pending
      var rls = graft.rc.Rls.State(cur.p, cur.w, cur.n)
      val out = Array.newBuilder[RlsOut]
      sorted.foreach { r =>
        val u = r.value / Esn.InputScale
        if (pending.nonEmpty) {
          rls = graft.rc.Rls.update(rls, pending, u)
          out += RlsOut(uid, rls.n, rls.w(0), rls.w(1))
        }
        x = Esn.step(m, x, u)
        pending = Esn.designRow(u, x)
      }
      st.update(RlsState(x, pending, rls.p, rls.w, rls.n))
      out.result().iterator
    }
  }

  def rlsTws(in: Dataset[EsnIn], m: Esn.Mats,
      lambda: Double): Dataset[RlsOut] =
    in.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new RlsProcessor(m, lambda), TimeMode.None(),
        OutputMode.Append())(Encoders.product[RlsOut])

  /** Keyed ESN reservoir update carried across micro-batches in
    * `flatMapGroupsWithState` — one small state vector per user. Rows
    * within a batch are sorted by (tsUs, event_id); cross-batch order is
    * the arrival order, as in any real stream.
    */
  def esnStates(in: Dataset[EsnIn], m: Esn.Mats): Dataset[EsnOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[EsnState, EsnOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[EsnIn], state: GroupState[EsnState]) =>
          val sorted = rows.toArray.sortBy(r => (r.tsUs, r.event_id))
          val st = state.getOption
            .getOrElse(EsnState(new Array[Double](Esn.Nx), 0L))
          var x = st.x
          var step = st.step
          val out = sorted.map { r =>
            x = Esn.step(m, x, r.value / Esn.InputScale)
            step += 1
            EsnOut(uid, step - 1, r.event_id, x(0), x(1))
          }
          state.update(EsnState(x, step))
          out.iterator
      }
  }

  // ---- event-time timers: state finalization + cleanup ----

  final case class IdleIn(user_id: Long, event_id: Long, tsUs: Long,
      value: Double)
  final case class IdleState(
      n: Long, sum100: Long, lastMs: Long, expiryMs: Long)
  final case class IdleOut(user_id: Long, n_events: Long, sum_val: Double)

  /** Finalize-on-inactivity with EVENT-TIME timers (`TimeMode.EventTime`):
    * each batch updates the per-key running summary and (re-)registers a
    * timer at lastEvent + gap; when the WATERMARK passes that point the
    * timer fires, the summary row is emitted and the state is DELETED —
    * the state-lifecycle pattern that keeps unbounded-key streams at
    * bounded state. A timer made stale by newer data in a later batch is
    * ignored by re-checking against the stored lastMs. (TTLConfig is the
    * wall-clock cousin of this; event-time timers are the deterministic,
    * replayable form.)
    */
  class IdleFinalizer(gapMs: Long)
      extends StatefulProcessor[Long, IdleIn, IdleOut] {
    @transient private var st: ValueState[IdleState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[IdleState]("idle",
        Encoders.product[IdleState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[IdleIn],
        tv: TimerValues): Iterator[IdleOut] = {
      var (n, s100, last, oldExpiry) =
        if (st.exists()) {
          val c = st.get(); (c.n, c.sum100, c.lastMs, c.expiryMs)
        } else (0L, 0L, Long.MinValue, Long.MinValue)
      rows.foreach { r =>
        n += 1
        val sc = r.value * 100 // half-away-from-zero, matches the oracle
        s100 += (if (sc >= 0) math.floor(sc + 0.5)
          else math.ceil(sc - 0.5)).toLong
        val ms = r.tsUs / 1000
        if (ms > last) last = ms
      }
      // one live timer per key: drop the previously registered one before
      // re-registering, or stale timers accumulate for the stream's
      // lifetime (the lastMs re-check masks them on fire, but the timer
      // STATE itself would grow unboundedly — defeating the bounded-state
      // goal this op advertises)
      val newExpiry = last + gapMs
      if (oldExpiry != Long.MinValue && oldExpiry != newExpiry)
        getHandle.deleteTimer(oldExpiry)
      st.update(IdleState(n, s100, last, newExpiry))
      if (oldExpiry != newExpiry) getHandle.registerTimer(newExpiry)
      Iterator.empty
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[IdleOut] = {
      if (!st.exists()) return Iterator.empty
      val cur = st.get()
      // stale timer (newer data arrived since it was registered): ignore
      if (info.getExpiryTimeInMs() < cur.lastMs + gapMs) Iterator.empty
      else {
        st.clear()
        Iterator.single(IdleOut(uid, cur.n, cur.sum100 / 100.0))
      }
    }
  }

  def idleFinalize(in: Dataset[IdleIn], gapMs: Long): Dataset[IdleOut] =
    in.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new IdleFinalizer(gapMs), TimeMode.EventTime(),
        OutputMode.Append())(Encoders.product[IdleOut])

  // ---- CEP pattern matching across micro-batches ----

  final case class CepIn(event_id: Long, tsUs: Long, user_id: Long,
      event_type: String)
  final case class CepState(lastType: String, lastId: Long, lastTsUs: Long)
  final case class CepOut(user_id: Long, view_id: Long, click_id: Long,
      gap_us: Long)

  /** Flink-CEP-style strict-contiguity pattern (view IMMEDIATELY FOLLOWED
    * BY click within `windowUs`) detected incrementally: the per-key state
    * is just the LAST seen event — O(1) per key regardless of stream
    * length — and a match is emitted the moment its second element
    * arrives. Rows within a batch are sorted by (tsUs, event_id); the
    * carried last-event state makes matches that straddle a micro-batch
    * boundary come out identical to the batch lead() formulation.
    */
  final case class KleeneState(lastType: String, lastId: Long,
      lastTsUs: Long, errSince: Long)
  final case class KleeneOut(user_id: Long, view_id: Long, click_id: Long,
      n_errors: Long, span_us: Long)

  /** Quantified CEP pattern (view (error)* click within `windowUs`) live:
    * per-key state is the last NON-ERROR event plus the count of errors
    * seen since it — still O(1) per key; a click arriving while that
    * anchor is a view inside the window emits the match with the error
    * count, any other non-error event replaces the anchor. Identical to
    * the batch last_value-IGNORE-NULLS formulation across micro-batch
    * boundaries because the anchor is carried in state.
    */
  def cepKleene(in: Dataset[CepIn], windowUs: Long): Dataset[KleeneOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[KleeneState, KleeneOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[CepIn], state: GroupState[KleeneState]) =>
          val sorted = rows.toArray.sortBy(r => (r.tsUs, r.event_id))
          var st = state.getOption
            .getOrElse(KleeneState("", -1L, Long.MinValue, 0L))
          val out = Array.newBuilder[KleeneOut]
          sorted.foreach { r =>
            if (r.event_type == "error") st = st.copy(errSince = st.errSince + 1)
            else {
              if (r.event_type == "click" && st.lastType == "view" &&
                  r.tsUs - st.lastTsUs <= windowUs)
                out += KleeneOut(uid, st.lastId, r.event_id, st.errSince,
                  r.tsUs - st.lastTsUs)
              st = KleeneState(r.event_type, r.event_id, r.tsUs, 0L)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  // ---- CEP absence detection (notFollowedBy) via event-time timers ----

  final case class CepToIn(user_id: Long, event_id: Long, tsUs: Long,
      event_type: String)
  /** pending views awaiting a click; timerMs is the registered timer so it
    * can be deleted before re-registering (one live timer per key) */
  final case class CepToState(ids: Array[Long], tsUs: Array[Long],
      timerMs: Long)
  final case class CepToOut(user_id: Long, view_id: Long, deadline_ms: Long)

  /** Flink-CEP's `notFollowedBy` within a window: emit each view that saw
    * NO click of the same user within `windowUs` — provable only once the
    * WATERMARK passes view + window, so the match is an event-time timer
    * firing, not a row arriving. State per key is the pending-view list
    * (bounded by views per window per user, cleared on click or timeout);
    * clicks prune pending views in-batch, the timer sits at the earliest
    * pending deadline. This is the streaming primitive batch SQL gets for
    * free with NOT EXISTS — the oracle states exactly that, bounded by the
    * final watermark (the repo's stream_idle_timeout_live convention).
    */
  class CepTimeout(windowUs: Long)
      extends StatefulProcessor[Long, CepToIn, CepToOut] {
    @transient private var st: ValueState[CepToState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[CepToState]("cepto",
        Encoders.product[CepToState], TTLConfig.NONE)

    private def deadlineMs(viewTsUs: Long): Long = (viewTsUs + windowUs) / 1000

    override def handleInputRows(uid: Long, rows: Iterator[CepToIn],
        tv: TimerValues): Iterator[CepToOut] = {
      val cur = if (st.exists()) st.get()
        else CepToState(Array.empty, Array.empty, Long.MinValue)
      var pending = cur.ids.zip(cur.tsUs).toVector
      rows.toArray.sortBy(r => (r.tsUs, r.event_id)).foreach { r =>
        if (r.event_type == "view") pending :+= ((r.event_id, r.tsUs))
        else if (r.event_type == "click")
          // a click satisfies every pending view it falls strictly after
          // and within the window of
          pending = pending.filterNot { case (_, vts) =>
            r.tsUs > vts && r.tsUs <= vts + windowUs
          }
      }
      val newTimer =
        if (pending.isEmpty) Long.MinValue
        else pending.map(p => deadlineMs(p._2)).min
      if (cur.timerMs != Long.MinValue && cur.timerMs != newTimer)
        getHandle.deleteTimer(cur.timerMs)
      if (newTimer != Long.MinValue && newTimer != cur.timerMs)
        getHandle.registerTimer(newTimer)
      st.update(CepToState(pending.map(_._1).toArray,
        pending.map(_._2).toArray, newTimer))
      Iterator.empty
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[CepToOut] = {
      if (!st.exists()) return Iterator.empty
      val cur = st.get()
      val wm = tv.getCurrentWatermarkInMs()
      val (expired, alive) = cur.ids.zip(cur.tsUs)
        .partition { case (_, vts) => deadlineMs(vts) <= wm }
      val out = expired.sortBy(_._1)
        .map { case (id, vts) => CepToOut(uid, id, deadlineMs(vts)) }
      if (alive.isEmpty) st.clear()
      else {
        val next = alive.map(p => deadlineMs(p._2)).min
        getHandle.registerTimer(next)
        st.update(CepToState(alive.map(_._1), alive.map(_._2), next))
      }
      out.iterator
    }
  }

  def cepTimeout(in: Dataset[CepToIn], windowUs: Long): Dataset[CepToOut] =
    in.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new CepTimeout(windowUs), TimeMode.EventTime(),
        OutputMode.Append())(Encoders.product[CepToOut])

  def cepPattern(in: Dataset[CepIn], windowUs: Long): Dataset[CepOut] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState[CepState, CepOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[CepIn], state: GroupState[CepState]) =>
          val sorted = rows.toArray.sortBy(r => (r.tsUs, r.event_id))
          var st = state.getOption.getOrElse(CepState("", -1L, Long.MinValue))
          val out = Array.newBuilder[CepOut]
          sorted.foreach { r =>
            if (st.lastType == "view" && r.event_type == "click" &&
                r.tsUs - st.lastTsUs <= windowUs)
              out += CepOut(uid, st.lastId, r.event_id, r.tsUs - st.lastTsUs)
            st = CepState(r.event_type, r.event_id, r.tsUs)
          }
          state.update(st)
          out.result().iterator
      }
  }
}
