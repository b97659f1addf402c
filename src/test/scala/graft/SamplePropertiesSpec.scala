package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll

import graft.ops.SampleOps

/** Property-based checks (ScalaCheck) for the SampleOps determinism
  * contracts — the invariants every operator in the family claims in
  * its Scaladoc, exercised across RANDOM id sets and parameters
  * rather than one fixture:
  *
  *  - rerun-stability: same inputs → identical output (no RNG state,
  *    no partition-order dependence)
  *  - append-stability: adding rows never changes an existing row's
  *    fate (split/sample membership survives dataset growth)
  *  - partition invariance: `repartition(k)` never changes results
  *
  * Driver-side evaluation: the hash contracts are pure functions of
  * the id, so properties replay them with `PortableHash.md5Long60`
  * (the spec-pinned driver twin) — each property is thousands of
  * cases without thousands of Spark jobs; the Spark-side parity of
  * the hash itself is pinned in OpsSpec, and two end-to-end Spark
  * cases anchor the bridge.
  */
class SamplePropertiesSpec extends SparkTestBase {

  import spark.implicits._

  private val Range60 = (1L << 60).toDouble

  private def uh(id: Long, salt: String): Double =
    graft.functions.PortableHash.md5Long60(s"$salt#$id") / Range60

  private val idSets: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000L)).map(_.distinct)

  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("property: Bernoulli sample membership is append-stable and monotone in fraction") {
    check(forAll(idSets, Gen.chooseNum(0.0, 1.0), Gen.chooseNum(0.0, 1.0)) {
      (ids, f1, f2) =>
        val (lo, hi) = if (f1 <= f2) (f1, f2) else (f2, f1)
        val keptLo = ids.filter(uh(_, "s") < lo).toSet
        val keptHi = ids.filter(uh(_, "s") < hi).toSet
        // growing the fraction only ever ADDS members; and membership
        // is a pure per-id predicate, so appends cannot change it
        keptLo.subsetOf(keptHi)
    })
  }

  test("property: hashSplit weights partition ids; assignment survives appends") {
    val weights = Seq("a" -> 1.0, "b" -> 3.0)
    def assign(id: Long): String = {
      val u = uh(id, "w")
      if (u < 0.25) "a" else "b"
    }
    check(forAll(idSets, idSets) { (ids, extra) =>
      val before = ids.map(i => i -> assign(i)).toMap
      val after = (ids ++ extra).distinct.map(i => i -> assign(i)).toMap
      ids.forall(i => before(i) == after(i))
    })
  }

  test("property: frequencyCap ranks are stable under suffix appends") {
    // within one content group, ranks are by ascending id — appending
    // HIGHER ids can only rank last, never displace existing copies
    check(forAll(idSets, Gen.chooseNum(1, 5)) { (ids, cap) =>
      val sorted = ids.sorted
      val before = sorted.zipWithIndex.toMap
      val grown = sorted ++ sorted.lastOption.map(_ + 1).toList
      val after = grown.sorted.zipWithIndex.toMap
      sorted.forall(i => before(i) == after(i)) &&
        sorted.forall(i => (before(i) < cap) == (after(i) < cap))
    })
  }

  test("anchor: Spark-side sampleByHash equals the driver-replayed predicate") {
    val ids = (1L to 500L)
    val df = ids.toDF("id")
    val sparkKept = SampleOps.sampleByHash(df, "id", 0.3, salt = "s")
      .select($"id").as[Long].collect().toSet
    val replayed = ids.filter(uh(_, "s") < 0.3).toSet
    assert(sparkKept == replayed)
    // partition invariance: layout never changes the kept set
    val repart = SampleOps.sampleByHash(df.repartition(7), "id", 0.3, salt = "s")
      .select($"id").as[Long].collect().toSet
    assert(repart == sparkKept)
  }

  test("property: globalNtile's tile formula IS SQL-standard NTILE for any (n, k)") {
    // driver-side replay of the exact arithmetic PrefixSum.globalNtile
    // builds in Column expressions (the Spark-side parity anchor is
    // PrefixSumSpec's ntile test); the SQL standard: the first n mod k
    // tiles take ceil(n/k) rows, the rest floor(n/k)
    def tileOf(rk: Long, n: Long, k: Int): Long = {
      val big = n / k; val rem = n % k
      if (rk <= (big + 1) * rem) (rk - 1) / (big + 1) + 1
      else rem + (rk - 1 - (big + 1) * rem) / math.max(big, 1L) + 1
    }
    check(forAll(Gen.chooseNum(1L, 100000L), Gen.chooseNum(1, 64)) {
      (n, k) =>
        val tiles = (1L to math.min(n, 3000L)).map(tileOf(_, n, k))
        val sizesOk =
          if (n <= 3000) {
            val sizes = tiles.groupBy(identity).view.mapValues(_.size.toLong)
            val big = n / k; val rem = n % k
            (1L to math.min(n, k.toLong)).forall { t =>
              sizes.getOrElse(t, 0L) == (if (t <= rem) big + 1 else big)
            } && tiles.max == math.min(n, k.toLong)
          } else true
        // non-decreasing in rank, 1-based, never exceeds k
        tiles.head == 1L && tiles.forall(t => t >= 1 && t <= k) &&
          tiles.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)) &&
          sizesOk
    })
  }

  test("property: uniformBucket's cut is weakly monotone and [0,n)-bounded") {
    // driver-side replay of the Column arithmetic (Spark-side anchor:
    // PrefixSumSpec's uniformBucket tests): floor((key-min)/width)
    // capped into [0,n), mirrored under descending
    def bucket(x: Double, lo: Double, hi: Double, n: Int,
               desc: Boolean): Long = {
      val span = hi - lo
      val width = if (span > 0) span / n else 1.0
      val dist = if (desc) hi - x else x - lo
      math.min(math.floor(dist / width).toLong, (n - 1).toLong)
    }
    val keys = Gen.nonEmptyListOf(Gen.chooseNum(-1e9, 1e9)).map(_.distinct)
    check(forAll(keys, Gen.chooseNum(1, 8192)) { (xs, n) =>
      val (lo, hi) = (xs.min, xs.max)
      val asc = xs.sorted.map(bucket(_, lo, hi, n, desc = false))
      val desc = xs.sorted.reverse.map(bucket(_, lo, hi, n, desc = true))
      def mono(s: List[Long]) =
        s.sliding(2).forall(p => p.length < 2 || p(0) <= p(1))
      mono(asc) && mono(desc) &&
        (asc ++ desc).forall(b => b >= 0 && b < n) &&
        asc.head == 0L && desc.head == 0L
    })
  }

  test("anchor: Spark-side quotaSample bottom-k equals the driver-replayed order") {
    val ids = (1L to 300L)
    val df = ids.map(i => (i, s"g${i % 3}")).toDF("doc_id", "source")
    val spark5 = SampleOps.quotaSample(df, "source", "doc_id",
      quotas = Map.empty, defaultQuota = 5, salt = "q")
      .select($"doc_id").as[Long].collect().toSet
    val replayed = ids.groupBy(i => s"g${i % 3}").values.flatMap { g =>
      g.toSeq.sortBy(i => (uh(i, "q"), i)).take(5)
    }.toSet
    assert(spark5 == replayed)
  }
}
