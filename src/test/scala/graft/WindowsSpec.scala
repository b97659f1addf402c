package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{HoppingWindow, SlidingWindow, TumblingWindow, WindowRange}

/** Port of the reference's window-math invariants
  * (`t/unit/windows/test_hopping_window.py:1-62`, tumbling/sliding
  * siblings) as seeded-random property checks — see FIXTURES.md §5.
  */
class WindowsSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)
  private def randTs(): Long = math.abs(rnd.nextLong()) % 4_000_000_000_000L

  test("tumbling: exactly one window, containing ts, aligned to size") {
    for (_ <- 1 to 2000) {
      val ts = randTs(); val size = 1 + rnd.nextInt(100_000)
      val rs = TumblingWindow(size).ranges(ts)
      assert(rs.size == 1)
      assert(rs.head.contains(ts))
      assert(rs.head.start % size == 0)
      assert(rs.head.end - rs.head.start == size)
    }
  }

  test("hopping: every range contains ts; size/step ranges for integral ratio") {
    for (_ <- 1 to 2000) {
      val ts = randTs()
      val step = 1L + rnd.nextInt(50)
      val size = step * (1 + rnd.nextInt(10))
      val w = HoppingWindow(size, step)
      val rs = w.ranges(ts)
      assert(rs.nonEmpty)
      rs.foreach(r => assert(r.contains(ts), s"$r !contains $ts"))
      assert(rs.size == size / step, s"expected ${size / step} got ${rs.size} (size=$size step=$step)")
      assert(w.current(ts) == rs.last)
      assert(w.earliest(ts) == rs.head)
      rs.sliding(2).foreach {
        case Seq(a, b) => assert(b.start - a.start == step)
        case _         =>
      }
    }
  }

  test("hopping: ranges are exhaustive — no other aligned window contains ts") {
    for (_ <- 1 to 1000) {
      val ts = randTs()
      val step = 1L + rnd.nextInt(40)
      val size = step * (1 + rnd.nextInt(6))
      val got = HoppingWindow(size, step).ranges(ts).toSet
      val lo = (ts - size - step) / step * step
      val brute = (lo to ts + step by step)
        .map(s => WindowRange(s, s + size))
        .filter(_.contains(ts)).toSet
      assert(got == brute)
    }
  }

  test("hopping stale: ts expired iff at or before current(latest-expires).start") {
    for (_ <- 1 to 1000) {
      val latest = randTs(); val exp = 100L + rnd.nextInt(10_000)
      val w = HoppingWindow(1000, 500, expires = Some(exp))
      val boundary = w.current(latest - exp).start
      assert(w.stale(boundary, latest))
      assert(!w.stale(boundary + 1, latest))
    }
  }

  test("sliding: single record-relative range [ts-before, ts+after]") {
    for (_ <- 1 to 1000) {
      val ts = randTs()
      val before = rnd.nextInt(5000).toLong; val after = rnd.nextInt(5000).toLong
      val w = SlidingWindow(before, after, expires = Some(10_000L))
      val r = w.ranges(ts).head
      assert(r.start == ts - before && r.end == ts + after + 1)
      assert(w.stale(ts, ts + 10_000L))
      assert(!w.stale(ts, ts + 9_999L))
    }
  }

  test("tumbling == hopping(size, size)") {
    for (_ <- 1 to 500) {
      val ts = randTs(); val size = 1 + rnd.nextInt(50_000)
      assert(TumblingWindow(size).ranges(ts) == HoppingWindow(size, size).ranges(ts))
    }
  }
}
