package graft

import org.apache.spark.sql.functions._

/** Semantic identities for the round-11 report queries — properties
  * their DuckDB oracles replay but do not EXPLAIN: decomposition
  * closure, score-tile bounds, association-rule arithmetic, and
  * correlation ranges. Each runs the registered query verbatim on the
  * sf0.001 corpus.
  */
class Round11Spec extends SparkTestBase {

  import spark.implicits._

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q95 decompose closes: total = trend + seasonal + remainder (6-dp)") {
    val rows = q("q95_seasonal_decompose")
      .select($"total", $"trend", $"seasonal", $"remainder")
      .as[(Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, tr, se, re) =>
      assert(math.abs(t - (tr + se + re)) < 2e-6, s"$t != $tr+$se+$re")
    }
  }

  test("q96 RFM: tiles bounded 1..5, roughly equal, segments total partition") {
    val rows = q("q96_rfm_segments")
      .select($"r_score", $"f_score", $"m_score", $"segment")
      .as[(Int, Int, Int, String)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Seq(r._1, r._2, r._3)
      .forall(s => s >= 1 && s <= 5)))
    // NTILE balance: tile sizes differ by at most one
    Seq(rows.map(_._1), rows.map(_._2), rows.map(_._3)).foreach { scores =>
      val sizes = scores.groupBy(identity).values.map(_.length)
      assert(sizes.max - sizes.min <= 1, s"tile imbalance: $sizes")
    }
    val segs = Set("champion", "at_risk", "hibernating", "loyal",
      "big_spender", "casual")
    assert(rows.forall(r => segs(r._4)))
  }

  test("q100 rules: support·baskets = pair count; lift consistent with confidence") {
    val rows = q("q100_assoc_rules")
      .select($"n_both", $"n_a", $"n_b", $"support", $"confidence_a_to_b",
        $"lift")
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (nb, na, nbb, sup, conf, lift) =>
      assert(nb <= math.min(na, nbb), "pair count exceeds item support")
      assert(conf >= sup - 1e-9, "confidence below support is impossible")
      // lift = conf / P(b): sign of (lift-1) matches conf vs b's base rate
      assert(lift > 0.0)
    }
  }

  test("q104 movers: ordered by |change| descending, change arithmetic closes") {
    val rows = q("q104_weekly_movers")
      .select($"total", $"prev_total", $"change")
      .as[(Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (t, p, c) =>
      assert(math.abs(c - (t - p)) < 1e-6)
    }
    val mags = rows.map(r => math.abs(r._3))
    assert(mags.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("q106 correlations lie in [-1, 1]; every lag has full grid overlap count") {
    val rows = q("q106_lag_correlation")
      .select($"lag", $"n", $"corr")
      .as[(Long, Long, Double)].collect()
    assert(rows.length == 13)
    rows.foreach { case (lag, n, c) =>
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"lag $lag corr $c")
      assert(n > 0)
    }
    // overlap shrinks by |lag| hours off the grid ends
    val n0 = rows.find(_._1 == 0L).get._2
    rows.foreach { case (lag, n, _) =>
      assert(n == n0 - math.abs(lag), s"lag $lag overlap $n vs base $n0")
    }
  }

  test("q105 gap spectrum: bucket bounds honor powers of two, shares sum to one") {
    val rows = q("q105_gap_spectrum")
      .select($"log2_bucket", $"min_gap", $"max_gap", $"share")
      .as[(Int, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.filter(_._1 >= 0).foreach { case (b, lo, hi, _) =>
      assert(lo >= (1L << b) && hi < (1L << (b + 1)),
        s"bucket $b holds [$lo, $hi]")
    }
    val total = rows.map(_._4).sum
    assert(math.abs(total - 1.0) < 1e-4, s"shares sum to $total")
  }

  test("q101 attribution models reconcile: same conversions, same revenue") {
    val rows = q("q101_attribution_compare")
      .select($"last_n", $"last_revenue", $"first_n", $"first_revenue")
      .as[(Long, Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    // both models attribute EVERY conversion exactly once, so totals
    // match each other and the raw purchase count/revenue
    val purchases = Tables.events(spark, sf)
      .where($"event_type" === "purchase")
    val nP = purchases.count()
    val rev = purchases.agg(sum($"value".cast("decimal(18,2)")))
      .head().getDecimal(0).doubleValue()
    assert(rows.map(_._1).sum == nP && rows.map(_._3).sum == nP)
    assert(math.abs(rows.map(_._2).sum - rev) < 1e-6)
    assert(math.abs(rows.map(_._4).sum - rev) < 1e-6)
  }

  test("q97/q102 warehouse reports: late counts bounded, percentiles ordered") {
    val late = q("q97_late_shipment")
      .select($"n_orders", $"late_orders", $"late_share")
      .as[(Long, Long, Double)].collect()
    assert(late.nonEmpty)
    late.foreach { case (n, l, s) =>
      assert(l <= n && math.abs(s - l.toDouble / n) < 1e-6)
    }
    val lat = q("q102_ship_latency")
      .select($"p50_days", $"p90_days", $"max_days")
      .as[(Double, Double, Double)].collect()
    assert(lat.nonEmpty)
    lat.foreach { case (p50, p90, mx) =>
      assert(p50 <= p90 + 1e-9 && p90 <= mx + 1e-9)
    }
  }

  test("q98 heatmap shares sum to one; q103 conversions bounded by sessions") {
    val shares = q("q98_weekday_profile").select($"share")
      .as[Double].collect()
    assert(math.abs(shares.sum - 1.0) < 1e-4)
    val paths = q("q103_entry_path_conversion")
      .select($"n_sessions", $"n_converted", $"conversion_rate")
      .as[(Long, Long, Double)].collect()
    assert(paths.nonEmpty)
    paths.foreach { case (n, c, r) =>
      assert(c <= n && math.abs(r - c.toDouble / n) < 1e-6)
    }
  }

  test("t40 confusion rows close per language; t44 fertility never below one") {
    val conf = q("t40_lang_confusion")
      .select($"lang", $"row_rate").as[(String, Double)].collect()
    assert(conf.nonEmpty)
    conf.groupBy(_._1).foreach { case (lang, rs) =>
      val s = rs.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$lang row rates sum to $s")
    }
    // BPE only SPLITS words — every token yields >= 1 subword
    val fert = q("t44_tokenizer_fertility")
      .select($"fertility").as[Double].collect()
    assert(fert.nonEmpty && fert.forall(_ >= 1.0 - 1e-9), fert.toSeq.toString)
  }

  test("d32 fractions bounded; u09 decay only lowers priority; u10 shares close") {
    val d32 = q("d32_dup_window_fraction")
      .select($"n_windows", $"n_dup_windows", $"dup_window_fraction")
      .as[(Long, Long, Double)].collect()
    assert(d32.nonEmpty)
    d32.foreach { case (n, d, f) =>
      assert(d <= n && f >= 0.0 && f <= 1.0)
    }
    val u09 = q("u09_crawl_priority")
      .select($"pr", $"age_days", $"priority")
      .as[(Double, Int, Double)].collect()
    assert(u09.nonEmpty)
    u09.foreach { case (pr, age, pri) =>
      assert(pri <= pr + 1e-9, "freshness decay cannot raise priority")
      if (age == 0) assert(math.abs(pri - pr) < 1e-8, "zero age keeps rank")
    }
    val u10 = q("u10_param_census").select($"share").as[Double].collect()
    assert(math.abs(u10.sum - 1.0) < 1e-4)
  }

  test("q108 reconciles with q89: same actives, same new users, categories close") {
    val acc = q("q108_growth_accounting")
      .select($"day", $"active_users", $"new_users", $"retained_users",
        $"resurrected_users")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // two independently implemented queries agree on the shared facts
    val nvr = q("q89_new_vs_returning")
      .select($"day", $"active_users", $"new_users")
      .as[(Long, Long, Long)].collect()
    assert(nvr.nonEmpty && nvr.length == acc.size)
    nvr.foreach { case (d, active, newU) =>
      val a = acc(d)
      assert(a._2 == active, s"day $d actives ${a._2} != $active")
      assert(a._3 == newU, s"day $d new ${a._3} != $newU")
      assert(a._3 + a._4 + a._5 == a._2, s"day $d categories do not close")
    }
  }

  test("d35 increment pairs are exactly d33's pairs crossing the slice boundary") {
    val inc = q("d35_entity_match_incremental")
      .select($"id_new", $"id_old").as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val full = q("d33_fuzzy_key_pairs")
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    val crossing = full.filter { case (a, b) =>
      (a % 19 == 3) != (b % 19 == 3)
    }.toSet
    assert(inc == crossing, s"inc=${inc.size} crossing=${crossing.size}")
  }

  test("q107 revenue per nation is bounded by the unconstrained nation revenue") {
    val local = q("q107_local_supplier_volume")
      .select($"n_name", $"revenue").as[(String, Double)].collect().toMap
    // relaxing the local-supplier constraint can only grow revenue
    val all = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
      .join(Tables.nation(spark, sf), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)")
        * (lit(1.0).cast("decimal(18,2)")
          - $"l_discount".cast("decimal(18,2)"))).cast("double").as("rev"))
      .as[(String, Double)].collect().toMap
    assert(local.nonEmpty)
    local.foreach { case (n, r) =>
      assert(r <= all(n) + 1e-6, s"$n local $r exceeds total ${all(n)}")
    }
  }

  test("p25 leak audit: leaked grams never exceed the split's gram count") {
    val rows = q("p25_split_leak_audit")
      .select($"n_grams", $"n_leaked_grams", $"leak_rate")
      .as[(Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (n, l, r) =>
      assert(l <= n && r >= 0.0 && r <= 1.0)
      assert(math.abs(r - l.toDouble / n) < 1e-6)
    }
  }
}
