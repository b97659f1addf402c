package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine model training over corpus features — the "distill a
  * quality/language classifier from heuristic labels" loop a training
  * data pipeline runs to replace hand-tuned filter thresholds (CCNet /
  * fastText-style quality filtering, trained in place over the corpus
  * instead of exported to a side system).
  *
  * Everything here is built on the same cross-engine reproducibility
  * contract as [[VectorOps.kmeansTrain]]: the only order-dependent
  * reductions (gradient averages) are snapped to 6 dp before they
  * touch the weights, and the link function is RATIONAL (the "fast
  * sigmoid" z -> 0.5 + z / (2·(1+|z|)) — exact IEEE add/mul/div/abs,
  * no exp/log whose last-ulp behavior differs across libm builds), so
  * a fixed number of full-batch gradient steps produces bit-identical
  * weights on any engine. That is what makes the TRAINING itself
  * oracle-gateable, not just a frozen-weight inference pass.
  *
  * Scale shape (100 TB): one pass over the data per step — a narrow
  * feature projection plus ONE global aggregate (4 partial-aggregated
  * averages folding map-side to a single row); weights ride along as
  * plan literals. No joins, no wide shuffles, driver state is the
  * 4-double weight vector per step (control plane, like every
  * distributed SGD/L-BFGS driver sync).
  */
object LearnOps {

  /** Rational squashing link into (0, 1): 0.5 + z / (2·(1+|z|)).
    * Monotone, symmetric, saturating — a drop-in for the logistic
    * sigmoid with exactly reproducible IEEE arithmetic.
    */
  def fastSigmoid(z: Column): Column =
    lit(0.5) + z / (lit(2.0) * (lit(1.0) + abs(z)))

  /** Score a text column with trained [[trainQualityClassifier]]
    * weights — the inference half: a pure narrow scalar column, so it
    * drops into batch scans and streaming micro-batches alike (the
    * "train once on the corpus, score every incoming doc" loop).
    */
  def qualityScore(w: Seq[Double], text: Column,
                   stopwords: Seq[String]): Column = {
    require(w.length == 4, "expected 4 weights (bias + 3 features)")
    val q = TextOps.qualityColumns(text, stopwords).toMap
    fastSigmoid(lit(w(0)) * lit(1.0) + lit(w(1)) * q("mean_token_len") +
      lit(w(2)) * q("stopword_ratio") +
      lit(w(3)) * (q("n_tokens").cast("double") / 100.0))
  }

  /** Train a linear quality classifier by `steps` full-batch gradient
    * descent rounds on squared error through [[fastSigmoid]], over the
    * [[TextOps.qualityColumns]] features (bias, mean token length,
    * stopword ratio, tokens/100) against a caller-supplied 0/1 label
    * (e.g. `lang = 'en'` — distilling a language heuristic into a
    * quality-feature model).
    *
    * Weights start at zero; each step averages the per-row gradient
    * `2·(p−y)·p'(z)·x_j` (rounded to 6 dp — the one order-dependent
    * reduction), then updates `w_j := w_j − lr·g_j` in exact
    * arithmetic. Output rows (k, v): the trained weights `w0..w3` and
    * the final training `mse`, each a deterministic double.
    */
  def trainQualityClassifier(df: DataFrame, textCol: String, label: Column,
                             stopwords: Seq[String], steps: Int = 3,
                             lr: Double = 1.0): DataFrame = {
    val (feats, w) = trainWeights(df, textCol, label, stopwords, steps, lr)
    val pf = fastSigmoid(zOf(w))
    val mse = feats.agg(round(avg((pf - col("y")) * (pf - col("y"))), 6).as("v"))
      .select(lit("mse").as("k"), col("v"))
    import df.sparkSession.implicits._
    val weights = Seq("w0" -> w(0), "w1" -> w(1), "w2" -> w(2), "w3" -> w(3))
      .toDF("k", "v")
    mse.unionAll(weights)
  }

  private def zOf(w: Array[Double]): Column =
    lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")

  /** The GD loop shared by [[trainQualityClassifier]] (weights + mse
    * report) and [[classifierPrReport]] (per-threshold evaluation):
    * returns the feature frame and the trained weight vector.
    */
  private def trainWeights(df: DataFrame, textCol: String, label: Column,
                           stopwords: Seq[String], steps: Int,
                           lr: Double): (DataFrame, Array[Double]) = {
    require(steps > 0, "steps must be positive")
    val q = TextOps.qualityColumns(col(textCol), stopwords).toMap
    val feats = df.select(
      lit(1.0).as("x0"),
      q("mean_token_len").as("x1"),
      q("stopword_ratio").as("x2"),
      (q("n_tokens").cast("double") / 100.0).as("x3"),
      label.cast("double").as("y"))
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to steps) {
      val z = zOf(w)
      val p = fastSigmoid(z)
      // d fastSigmoid / dz = 1 / (2·(1+|z|)^2)
      val dpdz = lit(1.0) / (lit(2.0) * (lit(1.0) + abs(z)) * (lit(1.0) + abs(z)))
      val err = lit(2.0) * (p - col("y")) * dpdz
      val g = feats.agg(
        round(avg(err * col("x0")), 6).as("g0"),
        round(avg(err * col("x1")), 6).as("g1"),
        round(avg(err * col("x2")), 6).as("g2"),
        round(avg(err * col("x3")), 6).as("g3")).head()
      w = Array.tabulate(4)(j => w(j) - lr * g.getDouble(j))
    }
    (feats, w)
  }

  /** Per-threshold precision/recall of the trained classifier — the
    * eval half of the train→deploy loop (s17 recall and d24
    * calibration's pattern, for the model family): confusion counts
    * and PR at each fixed threshold over the trained scores. Counts
    * are integers and the scores are bit-reproducible (snapped-
    * gradient weights + exact feature arithmetic), so the whole
    * report is engine-exact; empty-denominator cells emit -1.0
    * rather than null (the driver's pandas path degrades nullable
    * doubles).
    *
    * Scale shape: one broadcast of the thresholds frame over the
    * scored scan, one bounded groupBy — the training loop itself is
    * the same `steps` 1-row aggregates t18 runs.
    */
  def classifierPrReport(df: DataFrame, textCol: String, label: Column,
                         stopwords: Seq[String],
                         thresholds: Seq[Double],
                         steps: Int = 3, lr: Double = 1.0): DataFrame = {
    require(thresholds.nonEmpty, "at least one threshold")
    val (feats, w) = trainWeights(df, textCol, label, stopwords, steps, lr)
    val scored = feats.select(fastSigmoid(zOf(w)).as("p"), col("y"))
    import df.sparkSession.implicits._
    val ratio = (num: Column, den: Column) =>
      when(den === 0L, lit(-1.0)).otherwise(num.cast("double") / den.cast("double"))
    scored.crossJoin(broadcast(thresholds.toDF("thr")))
      .groupBy("thr")
      .agg(
        count(when(col("p") >= col("thr") && col("y") === 1.0, 1)).as("tp"),
        count(when(col("p") >= col("thr") && col("y") === 0.0, 1)).as("fp"),
        count(when(col("p") < col("thr") && col("y") === 1.0, 1)).as("fn"),
        count(when(col("p") < col("thr") && col("y") === 0.0, 1)).as("tn"))
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"))
  }

  /** Leakage-safe target encoding — the feature-engineering staple
    * for high-cardinality categoricals: encode category g for row i
    * as the smoothed MEAN LABEL of g computed WITHOUT row i
    * (leave-one-out), shrunk toward the global prior by pseudo-count
    * `m`:
    *
    *   enc_i = (sum_g − y_i + m·p) / (n_g − 1 + m)
    *
    * LOO + smoothing is what keeps the encoding from leaking each
    * row's own label into its feature (the classic target-leak bug).
    * Deterministic: per-category label sums are exact decimals, the
    * prior is one fixed-order divide of exact totals, and the
    * per-row encode is a single fixed-order IEEE expression.
    *
    * Scale shape: one category census shuffle (partial-agg, categories
    * rows) broadcast back; the encode itself is a narrow projection.
    * Singleton categories fall back to the pure prior (n_g−1 = 0).
    */
  def targetEncode(df: DataFrame, catCol: String, label: Column,
                   m: Double): DataFrame = {
    require(m > 0, "smoothing pseudo-count m must be positive")
    val y = label.cast("decimal(18,2)")
    val base = df.withColumn("__graft_te_y", y)
    val census = base.groupBy(col(catCol))
      .agg(count(lit(1)).as("__graft_te_n"),
        sum(col("__graft_te_y")).as("__graft_te_sum"))
    val totals = census.agg(sum(col("__graft_te_n")).as("__nt"),
      sum(col("__graft_te_sum")).as("__st"))
    base.join(broadcast(census), Seq(catCol))
      .crossJoin(broadcast(totals))
      .withColumn("__graft_te_p",
        col("__st").cast("double") / col("__nt").cast("double"))
      .withColumn("target_enc",
        ((col("__graft_te_sum").cast("double") -
          col("__graft_te_y").cast("double") +
          lit(m) * col("__graft_te_p")) /
          (col("__graft_te_n").cast("double") - lit(1.0) + lit(m))))
      .drop("__graft_te_n", "__graft_te_sum", "__nt", "__st",
        "__graft_te_p", "__graft_te_y")
  }

  /** Lift / gains table — the ranking-quality view next to
    * [[classifierPrReport]]'s threshold view: bucket the population
    * into score quantiles and report each bucket's positive rate
    * against the base rate (`lift`). A useful scorer concentrates
    * positives in the top buckets (lift ≫ 1); lift ≈ 1 everywhere
    * means the score carries no ranking signal.
    *
    * Scale-honest bucketing: NO global sort / ntile — the quantile
    * cuts come from the portable dyadic-CMS sketch over the integer
    * score census (q57's build, the p15 curriculum pattern) and
    * broadcast back as an array probe, so bucket borders are
    * approximate (sketch-rank) but deterministic and engine-exact.
    *
    * `scoreCol` must be integer-valued in `[0, 2^levels)`; bucket k =
    * score above exactly k of the nBuckets−1 cuts (0 = bottom).
    */
  def liftTable(df: DataFrame, scoreCol: Column, label: Column,
                nBuckets: Int = 10, levels: Int = 10, depth: Int = 3,
                width: Int = 512): DataFrame = {
    require(nBuckets >= 2, "need at least 2 buckets")
    val phis = (1 until nBuckets).map(_.toDouble / nBuckets)
    val base = df.select(scoreCol.cast("long").as("__graft_lift_s"),
      label.cast("long").as("__graft_lift_y"))
    val census = base.groupBy(col("__graft_lift_s").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val regs = graft.ops.SketchOps.dyadicCmsRegistersFromCensus(census,
      Seq.empty, "v", "cnt", levels, depth, width)
    val total = census.agg(sum("cnt").as("n"))
    val cuts = graft.ops.SketchOps.dyadicCmsQuantiles(regs, total, phis,
        levels, depth, width)
      .agg(sort_array(collect_list(col("q_est"))).as("_cuts"))
    val per = base.crossJoin(broadcast(cuts))
      .withColumn("bucket",
        size(filter(col("_cuts"), c => col("__graft_lift_s") > c)).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("__graft_lift_y")).as("n_pos"))
    val tot = per.agg(sum(col("n")).as("__nt"), sum(col("n_pos")).as("__pt"))
    per.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n")).as("pos_rate"),
        ((col("n_pos").cast("double") / col("n")) /
          (col("__pt").cast("double") / col("__nt"))).as("lift"))
  }
}
