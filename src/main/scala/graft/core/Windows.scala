package graft.core

/** Pure event-time window math, no Spark dependency.
  *
  * Mirrors the reference's window-assignment semantics
  * (`/root/reference/faust/windows.py:40-161`) with one deliberate
  * normalization: ranges are half-open `[start, end)` (Spark's
  * convention) instead of the reference's inclusive `end - 0.1`
  * artifact (`/root/reference/faust/types/windows.py:14-17`). Event
  * assignment is identical for any timestamp granularity; only the
  * printed window-end differs.
  *
  * All timestamps are epoch milliseconds (Long) — integer arithmetic
  * only, so assignment is exact and engine-independent.
  */
sealed trait WindowSpec {

  /** All windows containing `ts`, earliest first. */
  def ranges(ts: Long): Seq[WindowRange]

  /** The latest window containing `ts`. */
  def current(ts: Long): WindowRange = ranges(ts).last

  /** The earliest window containing `ts`. */
  def earliest(ts: Long): WindowRange = ranges(ts).head

  /** Retention: how long after a window closes its state is kept. */
  def expires: Option[Long]

  /** Is the window for `ts` expired relative to stream-time `latest`?
    * (`faust/windows.py:47-49`: stale iff ts <= current(latest - expires).start
    * for hopping/tumbling; `windows.py:134-139` for sliding.)
    */
  def stale(ts: Long, latest: Long): Boolean
}

/** Half-open window `[start, end)`. */
final case class WindowRange(start: Long, end: Long) {
  def contains(ts: Long): Boolean = ts >= start && ts < end
}

/** Fixed, non-overlapping windows of `sizeMs`
  * (`faust/windows.py:89-96` — tumbling = hopping with step == size).
  */
final case class TumblingWindow(sizeMs: Long, expires: Option[Long] = None)
    extends WindowSpec {
  require(sizeMs > 0, "window size must be positive")
  private val hop = HoppingWindow(sizeMs, sizeMs, expires)
  def ranges(ts: Long): Seq[WindowRange] = hop.ranges(ts)
  def stale(ts: Long, latest: Long): Boolean = hop.stale(ts, latest)
}

/** Overlapping windows of `sizeMs` starting every `stepMs`
  * (`faust/windows.py:21-70`): an event belongs to every window whose
  * `[start, start+size)` covers it — `size/step` windows for integral
  * ratios. Range start derivation mirrors `windows.py:40-45`.
  */
final case class HoppingWindow(sizeMs: Long, stepMs: Long,
                               expires: Option[Long] = None)
    extends WindowSpec {
  require(sizeMs > 0 && stepMs > 0 && stepMs <= sizeMs,
    "need 0 < step <= size")

  def ranges(ts: Long): Seq[WindowRange] = {
    val curr = floorDiv(ts, stepMs) * stepMs
    val earliestStart = curr - sizeMs + stepMs
    (earliestStart to curr by stepMs)
      .filter(start => ts >= start && ts < start + sizeMs)
      .map(start => WindowRange(start, start + sizeMs))
  }

  def stale(ts: Long, latest: Long): Boolean = expires.exists { exp =>
    // saturating subtraction: latest - exp with a huge expiry must clamp
    // to Long.MinValue, not wrap around to a large positive cutoff
    val cutoff =
      if (latest < Long.MinValue + exp) Long.MinValue else latest - exp
    ts <= current(cutoff).start
  }

  private def floorDiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
}

/** Window relative to each record: `[ts - before, ts + after]`
  * (`faust/windows.py:99-149`). `ranges` returns the single
  * record-relative range; pairing semantics are an interval join.
  */
final case class SlidingWindow(beforeMs: Long, afterMs: Long,
                               expires: Option[Long] = None)
    extends WindowSpec {
  require(beforeMs >= 0 && afterMs >= 0)

  def ranges(ts: Long): Seq[WindowRange] =
    Seq(WindowRange(ts - beforeMs, ts + afterMs + 1))

  def stale(ts: Long, latest: Long): Boolean =
    expires.exists(exp => ts <= latest - exp)
}
