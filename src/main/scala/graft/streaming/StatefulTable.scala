package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming keyed state — the faust Table write path
  * (`/root/reference/faust/tables/table.py:60-87`,
  * `tables/base.py:253-345`) on Spark's keyed-state machinery.
  *
  * Each micro-batch folds new events into per-key state and emits the
  * updated value (update-mode changelog semantics: one record per
  * changed key per batch, like the reference's changelog produce per
  * mutation, coalesced to batch granularity). State lives in the
  * configured state store (RocksDB in production:
  * `spark.sql.streaming.stateStore.providerClass`); recovery is
  * checkpoint restore — the entire `tables/recovery.py` machinery is
  * deleted.
  */
object StatefulTable {

  /** Running fold over a keyed stream. Emits `(key, newState)` for
    * every key touched in the batch.
    *
    * @param ttl optional state expiry (processing-time), the analog of
    *            table `expires` cleanup (`tables/base.py:347-403`)
    */
  def runningFold[T, K: Encoder, V: Encoder](
      ds: Dataset[T], key: T => K)(zero: V)(op: (V, T) => V)
      (ttl: Option[java.time.Duration] = None)
      (implicit kvEnc: Encoder[(K, V)]): Dataset[(K, V)] = {

    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    ds.groupByKey(key).flatMapGroupsWithState[V, (K, V)](
      OutputMode.Update(), timeout) {
      (k: K, events: Iterator[T], state: GroupState[V]) =>
        if (state.hasTimedOut) {
          state.remove()
          Iterator.empty
        } else {
          val start = state.getOption.getOrElse(zero)
          val next = events.foldLeft(start)(op)
          state.update(next)
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          Iterator.single(k -> next)
        }
    }
  }

  /** [[runningFold]] on the Spark 4 `transformWithState` API
    * (StatefulProcessor + typed ValueState): same contract, but state
    * TTL is declarative (`TTLConfig`) instead of timer bookkeeping,
    * and additional state variables / timers can be added without
    * changing the state schema encoding. Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass`) —
    * the provider `transformWithState` supports.
    */
  def runningFoldTws[T, K: Encoder, V: Encoder](
      ds: Dataset[T], key: T => K)(zero: V)(op: (V, T) => V)
      (ttl: Option[java.time.Duration] = None)
      (implicit kvEnc: Encoder[(K, V)]): Dataset[(K, V)] = {

    val vEnc = implicitly[Encoder[V]]
    val processor = new StatefulProcessor[K, T, (K, V)] {
      @transient private var state: ValueState[V] = _

      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
        val cfg = ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE)
        state = getHandle.getValueState[V]("fold", vEnc, cfg)
      }

      override def handleInputRows(k: K, rows: Iterator[T],
                                   tv: TimerValues): Iterator[(K, V)] = {
        val start = if (state.exists()) state.get() else zero
        val next = rows.foldLeft(start)(op)
        state.update(next)
        Iterator.single(k -> next)
      }
    }
    // TimeMode.None unless TTL is requested: ProcessingTime mode makes
    // every micro-batch schedule timer-driven follow-ups, which keeps
    // an idle query busy (and processAllAvailable never settles in
    // tests); state TTL is the one feature that needs the clock
    val timeMode =
      if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    ds.groupByKey(key).transformWithState(processor,
      timeMode, OutputMode.Update())
  }
}
