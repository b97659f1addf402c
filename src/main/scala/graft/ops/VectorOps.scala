package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scalar math is pure `functions._` HOFs (zip_with/aggregate) — stays
  * inside whole-stage codegen, no UDF serialization. Dot products fold
  * left-to-right in element order, so results are deterministic and
  * reproducible across engines.
  *
  * Scale notes (100 TB): [[knnBruteForce]] broadcasts the (small) query
  * side and computes exact top-k per partition before the final top-k
  * shuffle — correct baseline, O(N·Q). The scale path is
  * [[lshNearestNeighbors]]: sign-random-projection buckets cut the
  * candidate set to docs sharing a bucket, then exact rerank.
  */
object VectorOps {

  import graft.functions.VectorExpressions.vector_dot

  /** dot(a, b) in double precision, sequential fold in element order.
    * Native expression — bit-identical to the HOF
    * `aggregate(zip_with(...))` formulation, ~10× cheaper per pair.
    */
  def dot(a: Column, b: Column): Column = vector_dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for every vector (excluding self).
    * `right` is broadcast — at scale, the query set is the small side.
    * Norms are computed once per vector, not once per pair.
    */
  def knnBruteForce(left: DataFrame, right: DataFrame, idCol: String,
                    vecCol: String, k: Int): DataFrame = {
    val a = left.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      norm(col(vecCol)).as("nrm_a"))
    val b = right.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      norm(col(vecCol)).as("nrm_b"))
    val scored = a.join(broadcast(b), col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b"))).as("cos"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "cos")
  }

  /** Brute-force kNN as a per-partition primitive kernel — the
    * mapPartitions "last resort" used deliberately: a dense numeric
    * all-pairs loop gains nothing from Catalyst row machinery (the
    * declarative [[knnBruteForce]] spends most of its time copying
    * array columns through join rows). Math is the identical
    * sequential double fold and the top-k ordering matches
    * (cos DESC, id ASC), so results are bit-for-bit the same.
    * The right side is collected and broadcast — same contract as the
    * broadcast join in the declarative form, and the row guard makes
    * that contract self-enforcing: a right side past `maxRightRows`
    * fails fast with a pointer to the scale-path twins (s03 LSH /
    * s05 IVF) instead of OOMing the driver at collect. The probe is a
    * column-pruned limit-count, never a full scan.
    */
  def knnBruteForceKernel(left: DataFrame, right: DataFrame, idCol: String,
                          vecCol: String, k: Int,
                          maxRightRows: Int = 1 << 20): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val probe = right.select(col(idCol)).limit(maxRightRows + 1).count()
    require(probe <= maxRightRows,
      s"knnBruteForceKernel right side exceeds $maxRightRows rows — " +
        "brute force is the small-query-side fixture; use the bucketed " +
        "scale paths instead: VectorOps.knnLsh (s03) or knnIvf (s05)")
    val rightRows = right.select(col(idCol), col(vecCol))
      .as[(Long, Array[Float])].collect()
    val rightNorms = rightRows.map { case (_, v) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((rightRows, rightNorms))

    left.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (rRows, rNorms) = bc.value
        it.flatMap { case (idA, vecA) =>
          var sa = 0.0
          var i = 0
          while (i < vecA.length) { sa += vecA(i).toDouble * vecA(i).toDouble; i += 1 }
          val nrmA = math.sqrt(sa)
          // bounded top-k: (cos desc, id asc), insertion into k slots
          val topCos = Array.fill(k)(Double.NegativeInfinity)
          val topId = new Array[Long](k)
          var r = 0
          while (r < rRows.length) {
            val (idB, vecB) = rRows(r)
            if (idB != idA) {
              var dotAb = 0.0
              var j = 0
              val n = math.min(vecA.length, vecB.length)
              while (j < n) { dotAb += vecA(j).toDouble * vecB(j).toDouble; j += 1 }
              val cos = dotAb / (nrmA * rNorms(r))
              // find insertion slot (better = higher cos, or equal cos + lower id)
              var slot = k
              var s2 = k - 1
              while (s2 >= 0 && (cos > topCos(s2) ||
                (cos == topCos(s2) && idB < topId(s2)))) { slot = s2; s2 -= 1 }
              if (slot < k) {
                var m = k - 1
                while (m > slot) { topCos(m) = topCos(m - 1); topId(m) = topId(m - 1); m -= 1 }
                topCos(slot) = cos; topId(slot) = idB
              }
            }
            r += 1
          }
          (0 until math.min(k, rRows.length - 1)).iterator
            .filter(s => topCos(s) != Double.NegativeInfinity)
            .map(s => (idA, s + 1, topId(s), topCos(s)))
        }
      }.toDF("id_a", "rk", "id_b", "cos")
  }

  /** Maximum-inner-product search (MIPS) — top-k by RAW dot product,
    * the retrieval objective when magnitude carries signal (recommender
    * scores, unnormalized query/doc towers) and cosine's normalization
    * would erase it. Same kernel contract as [[knnBruteForceKernel]]
    * (broadcast right side, bounded top-k insertion, ties broken by
    * lower id), scoring `dot` instead of `cos`.
    *
    * Scale path: the norm-augmentation reduction (Bachrach et al.
    * 2014) — append sqrt(M² − ‖x‖²) to each database vector and 0 to
    * queries, where M = max norm — turns MIPS into cosine NN, so the
    * s03 LSH / s05 IVF bucketed tiers apply unchanged; this kernel is
    * the exact small-right-side fixture that gates them.
    */
  def mipsBruteForceKernel(left: DataFrame, right: DataFrame, idCol: String,
                           vecCol: String, k: Int,
                           maxRightRows: Int = 1 << 20): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val probe = right.select(col(idCol)).limit(maxRightRows + 1).count()
    require(probe <= maxRightRows,
      s"mipsBruteForceKernel right side exceeds $maxRightRows rows — " +
        "use the norm-augmented bucketed tiers (see Scaladoc) instead")
    val rightRows = right.select(col(idCol), col(vecCol))
      .as[(Long, Array[Float])].collect()
    val bc = spark.sparkContext.broadcast(rightRows)

    left.select(col(idCol), col(vecCol)).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val rRows = bc.value
        it.flatMap { case (idA, vecA) =>
          val topDot = Array.fill(k)(Double.NegativeInfinity)
          val topId = new Array[Long](k)
          var r = 0
          while (r < rRows.length) {
            val (idB, vecB) = rRows(r)
            if (idB != idA) {
              var d = 0.0
              var j = 0
              val n = math.min(vecA.length, vecB.length)
              while (j < n) { d += vecA(j).toDouble * vecB(j).toDouble; j += 1 }
              var slot = k
              var s2 = k - 1
              while (s2 >= 0 && (d > topDot(s2) ||
                (d == topDot(s2) && idB < topId(s2)))) { slot = s2; s2 -= 1 }
              if (slot < k) {
                var m = k - 1
                while (m > slot) { topDot(m) = topDot(m - 1); topId(m) = topId(m - 1); m -= 1 }
                topDot(slot) = d; topId(slot) = idB
              }
            }
            r += 1
          }
          (0 until math.min(k, rRows.length - 1)).iterator
            .filter(s => topDot(s) != Double.NegativeInfinity)
            .map(s => (idA, s + 1, topId(s), topDot(s)))
        }
      }.toDF("id_a", "rk", "id_b", "dot")
  }

  /** MMR diversified rerank (Carbonell & Goldstein 1998): per query,
    * take the top-`kCand` candidates by cosine relevance, then
    * greedily select `kSelect` of them by Maximal Marginal Relevance —
    * score = λ·rel − (1−λ)·max-sim-to-already-selected — so the final
    * list trades relevance against redundancy (the standard RAG /
    * search-results diversification step).
    *
    * The selection loop unrolls into `kSelect` deterministic plan
    * stages (anti-join remaining → max-sim fold → per-query argmax);
    * scores snap to 6 dp before the argmax so the greedy path is
    * engine-portable, ties break on the lower candidate id. All
    * per-round joins are keyed on the query id and the candidate sets
    * are bounded by `kCand`, so every stage is a bounded per-query
    * computation at any corpus scale; candidate generation itself is
    * the brute-force fixture — swap in the LSH/IVF tiers (s03/s05)
    * for the 100 TB candidate stage.
    */
  def mmrRerank(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, kCand: Int, kSelect: Int,
                lambda: Double): DataFrame = {
    require(kSelect >= 1 && kCand >= kSelect, "need 1 <= kSelect <= kCand")
    // persist the two bounded intermediates: the unrolled greedy plan
    // references cand in every round (anti-join + rescore) and pairs
    // in every round after the first — without the cache each round
    // would re-run the full corpus-scale candidate scoring. Both are
    // |Q|·kCand(²) rows by construction, so the cache is tiny at any
    // corpus size.
    val cand = knnBruteForceKernel(queries, corpus, idCol, vecCol, kCand)
      .select(col("id_a").as("qid"), col("id_b").as("cid"),
        col("cos").as("rel"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vecs = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"),
      norm(col(vecCol)).as("nv"))
    // candidate×candidate cosines within each query's bounded set
    val pairs = cand.select(col("qid"), col("cid"))
      .join(cand.select(col("qid"), col("cid").as("cid2")), Seq("qid"))
      .where(col("cid") =!= col("cid2"))
      .join(broadcast(vecs), col("cid") === col("vid"))
      .select(col("qid"), col("cid"), col("cid2"),
        col("v").as("va"), col("nv").as("na"))
      .join(broadcast(vecs), col("cid2") === col("vid"))
      .select(col("qid"), col("cid"), col("cid2"),
        (dot(col("va"), col("v")) / (col("na") * col("nv"))).as("sim"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lam = lit(lambda)
    // expression-level 1-λ (NOT a Scala-side subtraction result typed
    // into SQL): both engines then run the identical IEEE 1-λ
    val mu = lit(1.0) - lit(lambda)
    def pick(scored: DataFrame, r: Int): DataFrame = {
      val w = Window.partitionBy("qid").orderBy(col("score").desc, col("cid"))
      scored.withColumn("__rk", row_number().over(w))
        .where(col("__rk") === 1)
        .select(col("qid"), col("cid"), lit(r).as("mmr_rank"),
          col("rel"), col("score"))
    }
    // persist each round's selection too: round r references sel(r−1)
    // twice (anti-join + max-sim), so an uncached lineage re-executes
    // every earlier round 2^r times — the BpeOps per-round-persist
    // lesson (measured 5.4 s → sub-second on the cached rounds alone)
    var sel = pick(cand.withColumn("score", round(lam * col("rel"), 6)), 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // track every cached round so the intermediates can be released
    // once the final selection is materialized — without this each
    // invocation leaks 2+kSelect cached frames for the session lifetime
    var cached = List[DataFrame](sel)
    for (r <- 2 to kSelect) {
      val rem = cand.join(sel.select(col("qid"), col("cid")),
        Seq("qid", "cid"), "left_anti")
      val ms = pairs.join(sel.select(col("qid"), col("cid").as("cid2")),
          Seq("qid", "cid2"))
        .groupBy("qid", "cid").agg(max(col("sim")).as("maxsim"))
      val scored = rem.join(ms, Seq("qid", "cid"))
        .withColumn("score",
          round(lam * col("rel") - mu * col("maxsim"), 6))
      sel = sel.unionByName(
        pick(scored.select("qid", "cid", "rel", "score"), r))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cached ::= sel
    }
    // eager localCheckpoint materializes the |Q|·kSelect-row result
    // (bounded by construction), truncating its lineage so every
    // intermediate cache can be dropped NOW (the labelPropagation
    // pattern in GraphOps) — callers hold only the checkpointed frame
    val out = sel.select(col("qid").as("query_id"), col("mmr_rank"),
      col("cid").as("vec_id"), col("rel").as("relevance"),
      col("score").as("mmr_score")).localCheckpoint(true)
    cached.foreach(_.unpersist())
    cand.unpersist()
    pairs.unpersist()
    out
  }

  /** Near-duplicate pairs by embedding cosine (id_a < id_b, cos >= threshold). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
      norm(col(vecCol)).as("nrm_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
      norm(col(vecCol)).as("nrm_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b"))).as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Batch-hard triplet mining (the FaceNet recipe, Schroff et al.
    * 2015, arXiv:1503.03832 §3.2): per anchor, the HARDEST positive
    * (same label, lowest cosine) and HARDEST negative (different
    * label, highest cosine), plus whether the pair violates the
    * margin — the rows a metric-learning trainer actually consumes.
    *
    * Deterministic tie-breaks: lowest id wins on equal cosine, both
    * sides. Anchors missing a positive (singleton label) or a
    * negative (single-label corpus) are dropped.
    *
    * Scale shape: the same per-partition primitive-kernel contract as
    * [[knnBruteForceKernel]] (and its reason: the declarative
    * broadcast-join form spends most of its time copying array
    * columns through join rows — measured 2× slower at sf0.1).
    * Batch-hard mining is by construction per-batch, so the
    * broadcast right side is one mining batch, never the corpus;
    * corpus-scale mining blocks by label or IVF cell first
    * ([[ivfAssign]]) and runs this within blocks — the `maxRightRows`
    * guard makes that contract self-enforcing. The math is the
    * identical sequential double fold as the kernel kNN (bit-parity
    * to the declarative cosine, spec-proven there), argmin/argmax
    * ties break on the lower id. `labelCol` must be int-typed.
    */
  def tripletMine(df: DataFrame, idCol: String, vecCol: String,
                  labelCol: String, margin: Double,
                  maxRightRows: Int = 1 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val probe = df.select(col(idCol)).limit(maxRightRows + 1).count()
    require(probe <= maxRightRows,
      s"tripletMine batch exceeds $maxRightRows rows — batch-hard " +
        "mining is per-batch by contract; block by label or IVF cell " +
        "(VectorOps.ivfAssign) and mine within blocks")
    val typed = df.select(col(idCol), col(vecCol),
      col(labelCol).cast("int")).as[(Long, Array[Float], Int)]
    val rightRows = typed.collect()
    val rightNorms = rightRows.map { case (_, v, _) =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((rightRows, rightNorms))
    typed.mapPartitions { it =>
      val (rRows, rNorms) = bc.value
      it.flatMap { case (idA, vecA, labA) =>
        var sa = 0.0
        var i = 0
        while (i < vecA.length) { sa += vecA(i).toDouble * vecA(i).toDouble; i += 1 }
        val nrmA = math.sqrt(sa)
        // hardest positive: lowest same-label cos; hardest negative:
        // highest cross-label cos; equal cos → lower id wins
        var posCos = 0.0; var posId = -1L; var hasPos = false
        var negCos = 0.0; var negId = -1L; var hasNeg = false
        var r = 0
        while (r < rRows.length) {
          val (idB, vecB, labB) = rRows(r)
          if (idB != idA) {
            // corrupt embeddings must surface as errors, not as
            // silently truncated dots feeding plausible-but-wrong
            // hardest-positive/negative picks
            require(vecA.length == vecB.length,
              s"tripletMine: dimension mismatch — id $idA has " +
                s"${vecA.length} dims, id $idB has ${vecB.length}")
            var dotAb = 0.0
            var j = 0
            val n = vecA.length
            while (j < n) { dotAb += vecA(j).toDouble * vecB(j).toDouble; j += 1 }
            val cos = dotAb / (nrmA * rNorms(r))
            if (labB == labA) {
              if (!hasPos || cos < posCos ||
                (cos == posCos && idB < posId)) {
                posCos = cos; posId = idB; hasPos = true
              }
            } else {
              if (!hasNeg || cos > negCos ||
                (cos == negCos && idB < negId)) {
                negCos = cos; negId = idB; hasNeg = true
              }
            }
          }
          r += 1
        }
        if (hasPos && hasNeg)
          Iterator.single((idA, labA, posId, posCos, negId, negCos,
            negCos > posCos - margin))
        else Iterator.empty
      }
    }.toDF("id_a", "label", "id_pos", "cos_pos", "id_neg", "cos_neg",
      "violation")
  }

  /** SemDeDup-style semantic dedup census (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus into IVF cells, score
    * cosine only WITHIN cells, connect pairs above `threshold`, and
    * label connected components with their minimum id (the kept
    * representative). The cell step is what makes semantic dedup
    * linear-ish at 100 TB — candidate pairs are intra-cell only,
    * never corpus × corpus; components are labeled by the same
    * O(log diameter) pointer-jumping as the text dedup clusters
    * (d05/d06), so the whole op is cells + one bounded pair join +
    * ~30 label rounds at any scale.
    *
    * Same caveat as SemDeDup itself: near-dups straddling a cell
    * boundary are missed; raise `probes` to trade recall for pair
    * work (a pair connects if the two vectors co-occur in ANY probed
    * cell).
    *
    * Output: (doc_id, cluster_id, cluster_size, is_canonical) over
    * the id column — keep `is_canonical = 1` rows to dedup.
    */
  def semanticDedupClusters(df: DataFrame, idCol: String, vecCol: String,
                            nCells: Int, threshold: Double,
                            probes: Int = 1,
                            portablePivots: Boolean = false): DataFrame = {
    val assigned = ivfAssign(df, idCol, vecCol, nCells, probes, portablePivots)
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    val scored = a.join(b, Seq("cell"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b"))).as("cos"))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b")
    // only multi-probe can surface a pair in several cells; at the
    // default probes=1 each id lives in exactly one cell, so the
    // distinct would be a full extra shuffle of the candidate stream
    // for nothing
    val edges = if (probes > 1) scored.distinct() else scored
    graft.ops.TextOps.dedupClustersFromEdges(df, idCol, edges)
  }

  /** Deterministic pseudo-random hyperplane component: hash of
    * (plane, dim) mapped to [-1, 1). Reproducible with no RNG state.
    */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)).cast("double") / 1000000.0) - 1.0

  /** Sign-random-projection LSH bucket id: one bit per hyperplane. */
  def lshBucket(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (x, i) => x.cast("double") * planeComponent(p, i)),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Portable LSH bucket: hyperplane components derive from the MD5
    * hash of `"<plane>,<dim>"` ([[graft.functions.PortableHash]]), so
    * any engine reproduces the same buckets. The plane matrix is
    * materialized driver-side as literals — cheaper than per-row
    * hashing AND engine-independent. Oracle-verified flavor (s03).
    */
  def lshBucketPortable(vec: Column, numPlanes: Int, dim: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      val weights = typedlit((0 until dim).map(i =>
        graft.functions.PortableHash.unitValue(s"$p,$i")))
      val proj = aggregate(
        zip_with(vec, weights, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style ANN: partition the corpus into `nCells` Voronoi cells
    * around deterministically-chosen pivot vectors (lowest
    * xxhash64(id) — reproducible, no RNG/kmeans state), assign each
    * vector to its `probes` nearest pivots, then exact-rerank within
    * cells. Candidate work is N·nCells dots for assignment plus
    * intra-cell pairs — the standard IVF trade against brute force.
    */
  /** IVF cell assignment: pick `nCells` deterministic pivots, assign
    * every vector to its `probes` nearest — the shared front half of
    * IVF search and IVF maintenance. Returns (cell, id, vec, nrm).
    */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                nCells: Int, probes: Int = 1,
                portablePivots: Boolean = false): DataFrame = {
    // portable pivot choice orders by the MD5 hex of the id string —
    // reproducible in any engine (oracle-verified flavor, s05)
    val pivotOrder =
      if (portablePivots) md5(col("pid").cast("string")) else xxhash64(col("pid"))
    val pivots = df
      .select(col(idCol).as("pid"), col(vecCol).as("pvec"),
        norm(col(vecCol)).as("pnrm"))
      .orderBy(pivotOrder, col("pid")).limit(nCells)
    val wAssign = Window.partitionBy("id").orderBy(col("psim").desc, col("pid"))
    df.select(col(idCol).as("id"), col(vecCol).as("vec"), norm(col(vecCol)).as("nrm"))
      .join(broadcast(pivots))
      .select(col("id"), col("vec"), col("nrm"), col("pid"),
        (dot(col("vec"), col("pvec")) / (col("nrm") * col("pnrm"))).as("psim"))
      .withColumn("prk", row_number().over(wAssign))
      .where(col("prk") <= probes)
      .select(col("pid").as("cell"), col("id"), col("vec"), col("nrm"))
  }

  /** Per-cell element-wise centroids — the IVF maintenance / k-means
    * step: mean of each vector component within a cell. One explode +
    * one shuffle on (cell, i); centroid components are rounded to 6 dp
    * so the result is engine-independent (double summation order
    * differs across engines by ~1 ulp). Output: (cell, i, c, n) with
    * i 1-based.
    */
  def ivfCellCentroids(df: DataFrame, idCol: String, vecCol: String,
                       nCells: Int,
                       portablePivots: Boolean = false): DataFrame =
    ivfAssign(df, idCol, vecCol, nCells, probes = 1, portablePivots)
      .select(col("cell"), posexplode(col("vec")))
      .select(col("cell"), (col("pos") + 1).as("i"), col("col").cast("double").as("x"))
      .groupBy("cell", "i")
      .agg(round(avg(col("x")), 6).as("c"), count(lit(1)).as("n"))

  /** Pairwise cosine between per-label mean embeddings — the
    * embedding-space drift/separation monitor: collapsing centroids
    * (cos → 1) mean two labels/sources have converged (a labeling
    * problem or a domain shift); it is also the cheap class-
    * separability report before training on the labels.
    *
    * Centroids are 6 dp-snapped dimension means (s06's contract), so
    * the report is engine-replayable; the pairwise stage runs on
    * labels² centroid rows — the corpus is read ONCE into
    * labels × dim mean cells and never self-joins.
    */
  def labelCentroidDrift(df: DataFrame, vecCol: String,
                         labelCol: String): DataFrame = {
    val cent = df
      .select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .select(col("label"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
      .groupBy("label", "i")
      .agg(round(avg(col("x")), 6).as("c"))
      .groupBy("label")
      .agg(count(lit(1)).as("_dims"),
        transform(array_sort(collect_list(struct(col("i"), col("c")))),
          s => s.getField("c")).as("cv"))
    val a = cent.select(col("label").as("label_a"), col("cv").as("va"))
    val b = cent.select(col("label").as("label_b"), col("cv").as("vb"))
    val dotAb = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val nrm = (v: Column) => sqrt(aggregate(
      zip_with(v, v, (x, y) => x * y), lit(0.0), (acc, z) => acc + z))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        (dotAb / (nrm(col("va")) * nrm(col("vb")))).as("cos_centroid"))
  }

  def ivfNearestNeighbors(df: DataFrame, idCol: String, vecCol: String,
                          nCells: Int, k: Int, probes: Int = 1,
                          portablePivots: Boolean = false): DataFrame = {
    // pinned (r19): the intra-cell self-join references the assignment
    // twice — each leg re-ran the scan + pivot broadcast + assignment
    // window (see TextOps.minHashSigFrame for the checkpoint-not-
    // persist rationale)
    val assigned = ivfAssign(df, idCol, vecCol, nCells, probes, portablePivots)
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    val paired = a.join(b, Seq("cell"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b"))).as("cos"))
    // multi-probe can surface a pair in several cells; single-probe
    // cannot, so skip the dedup shuffle there
    val scored = if (probes > 1) paired.distinct() else paired
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "cos")
  }

  /** ANN recall@k report — the index-tuning evaluation loop run
    * in-engine: on a deterministic hash-sampled query subset, exact
    * brute-force top-k is the ground truth and [[ivfNearestNeighbors]]
    * the candidate; per query, how many of the true k the index
    * returned. This is the number that decides nCells/probes (FAISS's
    * recall-QPS tradeoff) — without it an ANN deployment is untuned
    * guesswork.
    *
    * Scale shape: the ground truth is inherently exact, so it is
    * bounded the standard way — SAMPLE the queries (mod `sampleMod`
    * on the portable 60-bit hash), broadcast only the sampled side,
    * and stream the corpus through one cos + WindowGroupLimit top-k
    * (d17's pruning shape; the corpus is never broadcast and never
    * self-joined). The IVF side is the s05 plan filtered to the same
    * sample BEFORE its window. Queries with zero IVF candidates
    * (alone in every probed cell) still report, at recall 0, via the
    * truth-side left join.
    */
  /** Recall CURVE — [[annRecallReport]] swept over k in one pass:
    * truth and index lists rank once to `kMax`, the join carries both
    * ranks, and each cutoff reads the same matched set. The
    * mean-recall-vs-k table is the operating curve that picks k for a
    * latency budget (the companion to the nCells/probes knobs).
    * Queries are assumed to have ≥ kMax true neighbors (corpus ≫
    * kMax), so the denominator is queries × k.
    */
  def annRecallCurve(df: DataFrame, idCol: String, vecCol: String,
                     nCells: Int = 16, kMax: Int = 5, probes: Int = 2,
                     sampleMod: Int = 20,
                     ks: Seq[Int] = Seq(1, 3, 5)): DataFrame = {
    import graft.functions.PortableHash
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= kMax),
      "cutoffs must lie in [1, kMax]")
    def sampled(c: Column): Column =
      PortableHash.mdHash60(c.cast("string")) % sampleMod === 0
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    val queries = base.where(sampled(col("id")))
      .select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a"))
    val scored = base
      .select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b"))
      .join(broadcast(queries), col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cos"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    val truth = scored.withColumn("rk_t", row_number().over(w))
      .where(col("rk_t") <= kMax).select("id_a", "id_b", "rk_t")
    val approx = ivfNearestNeighbors(df, idCol, vecCol, nCells, kMax,
        probes, portablePivots = true)
      .where(sampled(col("id_a")))
      .select(col("id_a"), col("id_b"), col("rk").as("rk_a"))
    val matched = truth.join(approx, Seq("id_a", "id_b"))
    val nq = queries.agg(count(lit(1)).as("n_queries"))
    val ksDf = df.sparkSession.range(1)
      .select(explode(array(ks.map(lit(_)): _*)).as("k"))
    val hits = matched
      .join(broadcast(ksDf),
        col("rk_t") <= col("k") && col("rk_a") <= col("k"))
      .groupBy("k").agg(count(lit(1)).as("n_hits"))
    ksDf.join(hits, Seq("k"), "left")
      .crossJoin(broadcast(nq))
      .select(col("k"), col("n_queries"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / (col("n_queries") * col("k")), 6).as("mean_recall"))
      .orderBy("k")
  }

  def annRecallReport(df: DataFrame, idCol: String, vecCol: String,
                      nCells: Int = 16, k: Int = 3, probes: Int = 2,
                      sampleMod: Int = 20): DataFrame = {
    import graft.functions.PortableHash
    require(sampleMod >= 1, "sampleMod >= 1")
    def sampled(c: Column): Column =
      PortableHash.mdHash60(c.cast("string")) % sampleMod === 0
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))
    val queries = base.where(sampled(col("id")))
      .select(col("id").as("id_a"), col("vec").as("vec_a"),
        col("nrm").as("nrm_a"))
    val scored = base
      .select(col("id").as("id_b"), col("vec").as("vec_b"),
        col("nrm").as("nrm_b"))
      .join(broadcast(queries), col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cos"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    val truth = scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k).select("id_a", "id_b")
    val approx = ivfNearestNeighbors(df, idCol, vecCol, nCells, k, probes,
        portablePivots = true)
      .where(sampled(col("id_a")))
      .select(col("id_a"), col("id_b")).withColumn("_hit", lit(1))
    truth.join(approx, Seq("id_a", "id_b"), "left")
      .groupBy("id_a").agg(count(col("_hit")).as("n_hits"))
      .select(col("id_a"), col("n_hits"),
        (col("n_hits").cast("double") / lit(k.toDouble)).as("recall"))
  }

  /** Semantic decontamination — [[graft.ops.TextOps.decontaminate]]'s
    * contract at EMBEDDING granularity: flag corpus vectors whose
    * cosine similarity to ANY eval-set vector reaches `threshold`
    * (paraphrased benchmark leakage that n-gram overlap structurally
    * misses — the reason semantic dedup papers run both filters).
    * Eval membership is the deterministic portable hash sample
    * (`mdHash60(id) % evalMod == 0`, the s17/s18 convention); corpus =
    * everything else.
    *
    * Scale shape: the SemDeDup cell trick (s09) applied cross-set —
    * both sides share ONE [[ivfAssign]] pass (pivots from the full
    * table, so cells are consistent), and only corpus×eval pairs
    * CO-RESIDENT in a probed cell are scored: candidate work is
    * intra-cell, never corpus×eval. The eval side of the cell join is
    * the small side and broadcasts. Same recall caveat as SemDeDup:
    * a contaminated pair straddling cell boundaries needs `probes` > 1
    * to surface (a pair connects if the two vectors co-occur in ANY
    * probed cell).
    *
    * Output: one row per CONTAMINATED corpus vector —
    * (id, n_eval_hits, max_cos, eval_id) with `eval_id` the
    * highest-cos (ties → lowest id) offending eval vector.
    */
  def semanticDecontaminate(df: DataFrame, idCol: String, vecCol: String,
                            evalMod: Int, nCells: Int, threshold: Double,
                            probes: Int = 1,
                            portablePivots: Boolean = false): DataFrame = {
    import graft.functions.PortableHash
    require(evalMod >= 2, "evalMod >= 2 (both sides must be non-empty)")
    val isEval = PortableHash.mdHash60(col("id").cast("string")) % evalMod === 0
    val assigned = ivfAssign(df, idCol, vecCol, nCells, probes, portablePivots)
    val corpus = assigned.where(!isEval)
      .select(col("cell"), col("id"), col("vec"), col("nrm"))
    val eval = assigned.where(isEval)
      .select(col("cell"), col("id").as("eval_id"),
        col("vec").as("vec_e"), col("nrm").as("nrm_e"))
    corpus.join(broadcast(eval), Seq("cell"))
      .select(col("id"), col("eval_id"),
        (dot(col("vec"), col("vec_e")) / (col("nrm") * col("nrm_e"))).as("cos"))
      .where(col("cos") >= threshold)
      .groupBy(col("id"))
      // multi-probe may surface the same (corpus, eval) pair in
      // several cells: max is duplicate-immune, the hit count needs
      // the distinct
      .agg(countDistinct(col("eval_id")).as("n_eval_hits"),
        max(struct(col("cos"), (-col("eval_id")).as("neg"))).as("_top"))
      .select(col("id"), col("n_eval_hits"),
        col("_top.cos").as("max_cos"), (-col("_top.neg")).as("eval_id"))
  }

  /** ANN: bucket vectors by [[lshBucket]], exact cosine rerank within
    * buckets, top-k per query. Only intra-bucket pairs are scored.
    */
  def lshNearestNeighbors(df: DataFrame, idCol: String, vecCol: String,
                          numPlanes: Int, k: Int,
                          portableDim: Option[Int] = None): DataFrame = {
    val bucketFn = portableDim
      .map(d => lshBucketPortable(col(vecCol), numPlanes, d))
      .getOrElse(lshBucket(col(vecCol), numPlanes))
    val bucketed = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      bucketFn.as("bucket"),
      norm(col(vecCol)).as("nrm"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    val scored = a.join(b, Seq("bucket"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b"))).as("cos"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "cos")
  }
  /** Product-quantization codes: split each vector into `m` subvectors
    * and assign every subvector to its nearest (L2) codeword — the
    * IVF-PQ compression step that shrinks a 100 TB embedding store to
    * `m` bytes/vector for candidate scanning. Codebooks are chosen
    * deterministically like [[ivfAssign]]'s pivots (lowest hash-of-id
    * vectors, subsliced per subspace) — no k-means RNG state, so codes
    * are reproducible in any engine (`portablePivots = true` is the
    * oracle-verified flavor).
    *
    * Scale shape: the codebook (m·nCentroids subvectors) broadcasts;
    * distance evaluation is a narrow explode over subspaces; the
    * argmin is `min(struct(dist, codeword))` — partial-aggregatable
    * map-side, so the one shuffle carries a single row per (id, sub),
    * never the per-codeword candidates (a window argmin would).
    * Output: (id, sub, code, sq_err), sq_err rounded to 6 dp.
    */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
              m: Int, nCentroids: Int, dim: Int,
              portablePivots: Boolean = false): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val pivotOrder =
      if (portablePivots) md5(col("pid").cast("string")) else xxhash64(col("pid"))
    val pivots = df.select(col(idCol).as("pid"), col(vecCol).as("pvec"))
      .orderBy(pivotOrder, col("pid")).limit(nCentroids)
    val subs = df
      .select(col(idCol).as("id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col(vecCol).as("vec"))
      .select(col("id"), col("sub"),
        slice(col("vec"), col("sub") * subDim + 1, lit(subDim)).as("svec"))
    val d2 = aggregate(
      zip_with(col("svec"),
        slice(col("pvec"), col("sub") * subDim + 1, lit(subDim)),
        (a, b) => (a.cast("double") - b.cast("double"))
          * (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    subs.join(broadcast(pivots))
      .select(col("id"), col("sub"), col("pid"), d2.as("d2"))
      .groupBy("id", "sub")
      .agg(min(struct(col("d2"), col("pid"))).as("best"))
      .select(col("id"), col("sub"), col("best.pid").as("code"),
        round(col("best.d2"), 6).as("sq_err"))
  }

  /** Lloyd's spherical k-means trainer — the centroid-TRAINING loop
    * the IVF family ([[ivfAssign]]/[[ivfNearestNeighbors]]/
    * `semanticDedupClusters`) takes as given. Those ops use raw pivot
    * vectors as cells; `iters` Lloyd rounds move the pivots to the
    * actual cluster means, which is what makes IVF recall usable in
    * practice (trained coarse quantizer, à la FAISS `IndexIVF.train`).
    *
    * Semantics per round: assign every vector to the max-cosine
    * centroid (ties -> lowest cell id, matching [[ivfAssign]]'s
    * `ORDER BY psim DESC, pid`), then recompute each centroid as the
    * element-wise mean of its members, ROUNDED to 6 dp. The rounding
    * is the cross-engine parity contract (double summation order
    * differs by ~1 ulp across engines — same trick as
    * [[ivfCellCentroids]]); because each round's output is snapped,
    * the NEXT round's input is bit-identical on any engine, so the
    * whole iteration is reproducible end-to-end. Cells that lose all
    * members drop out (standard Lloyd's; the oracle's GROUP BY drops
    * them identically). Init centroids are the pivot vectors
    * themselves (exact float->double cast, no rounding needed).
    *
    * Scale shape (100 TB): centroids are a k·dim plan LITERAL
    * (broadcast with the task binary), so ASSIGNMENT is a zero-shuffle
    * narrow projection — an `aggregate` HOF argmin over the centroid
    * array, fully inside whole-stage codegen. The UPDATE is one
    * partial-aggregated shuffle carrying (cell, i) component means —
    * k·dim rows, never vectors. Between rounds the k·dim·8-byte
    * centroid table is collected to the driver: control plane, not
    * data plane — the same per-iteration driver sync every Lloyd
    * implementation does (Spark MLlib's own KMeans collects centers
    * each round), bounded by the `k * dim <= 16384` guard below
    * (which also caps plan-literal size for codegen). Each round is
    * one pass over the data; `iters` is a small constant.
    *
    * Output: (cell, i, c, n) — final centroid components (1-based i)
    * with member counts, the [[ivfCellCentroids]] shape. `iters = 1`
    * is bit-identical to `ivfCellCentroids` (spec-proven).
    *
    * Reference anchor: beyond-reference op (the reference has no
    * vector ops); cells/training per SemDeDup (arXiv:2303.09540) and
    * the IVF literature.
    */
  def kmeansTrain(df: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int,
                  portablePivots: Boolean = false): DataFrame = {
    require(iters > 0, "iters must be positive")
    // pinned (r19): every Lloyd round's collect re-scanned the corpus
    // through kmBase — one scan + norm pass now feeds all rounds
    val base = kmBase(df, idCol, vecCol).localCheckpoint(true)
    var cents = kmInitPivots(df, idCol, vecCol, k, portablePivots)
    for (_ <- 1 until iters) cents = kmCollect(kmUpdate(base, cents))
    // the last round stays lazy: callers get one scan + one shuffle
    kmUpdate(base, cents)
  }

  private def kmBase(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      norm(col(vecCol)).as("nrm"))

  /** Init centroids: pivot vectors, exact float->double widening;
    * sorted by cell so the [[kmBestCell]] fold tie-breaks low.
    */
  private def kmInitPivots(df: DataFrame, idCol: String, vecCol: String,
                           k: Int, portablePivots: Boolean): Seq[(Long, Array[Double])] = {
    require(k > 0, "k must be positive")
    val pivotOrder =
      if (portablePivots) md5(col("pid").cast("string")) else xxhash64(col("pid"))
    val cents = df
      .select(col(idCol).as("pid"), col(vecCol).as("pvec"))
      .orderBy(pivotOrder, col("pid")).limit(k)
      .select(col("pid"), transform(col("pvec"), x => x.cast("double")).as("cvec"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    val dim = cents.headOption.map(_._2.length).getOrElse(0)
    require(k * dim <= 16384,
      s"k*dim = ${k * dim} exceeds the 16384 centroid-literal bound; " +
        "train per-partition subsets or use ivfCellCentroids rounds with a join")
    cents
  }

  /** Max-cosine cell over the centroid literal, for a frame exposing
    * `vec`/`nrm`. Argmin by fold: strict > keeps the FIRST max — `cs`
    * is sorted by cell, so ties break to the lowest cell id like
    * [[ivfAssign]]'s `ORDER BY psim DESC, pid`. Zero-shuffle.
    */
  private def kmBestCell(cs: Seq[(Long, Array[Double])]): Column =
    kmBest(cs).getField("cell")

  /** Max-cosine (sim, cell) struct over the centroid literal — the
    * [[kmBestCell]] fold with the winning similarity kept, for callers
    * that need the distance-to-centroid itself (outlier scoring).
    */
  private def kmBest(cs: Seq[(Long, Array[Double])]): Column = {
    // left-to-right fold in element order, like the engine-side dots
    val centArr = array(cs.map { case (cell, cv) =>
      val cnrm = math.sqrt(cv.foldLeft(0.0)((s, x) => s + x * x))
      struct(lit(cell).as("cell"),
        array(cv.map(lit(_)): _*).as("cvec"), lit(cnrm).as("cnrm"))
    }: _*)
    def dotd(v: Column, cv: Column): Column =
      aggregate(zip_with(v, cv, (a, b) => a.cast("double") * b),
        lit(0.0), (s, x) => s + x)
    aggregate(centArr,
      struct(lit(Double.NegativeInfinity).as("sim"), lit(Long.MaxValue).as("cell")),
      (acc, c) => {
        val sim = dotd(col("vec"), c.getField("cvec")) /
          (col("nrm") * c.getField("cnrm"))
        when(sim > acc.getField("sim"),
          struct(sim.as("sim"), c.getField("cell").as("cell"))).otherwise(acc)
      })
  }

  /** One Lloyd update: assign (zero-shuffle argmin), then per-cell
    * component means rounded to 6 dp — one partial-agg shuffle.
    */
  private def kmUpdate(base: DataFrame,
                       cs: Seq[(Long, Array[Double])]): DataFrame =
    base.select(col("id"), col("vec"), kmBestCell(cs).as("cell"))
      .select(col("cell"), posexplode(col("vec")))
      .select(col("cell"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
      .groupBy("cell", "i")
      .agg(round(avg(col("x")), 6).as("c"), count(lit(1)).as("n"))

  private def kmCollect(update: DataFrame): Seq[(Long, Array[Double])] =
    update.select("cell", "i", "c").collect().toSeq
      .groupBy(_.getLong(0)).toSeq
      .map { case (cell, rs) =>
        (cell, rs.sortBy(_.getInt(1)).map(_.getDouble(2)).toArray)
      }
      .sortBy(_._1)

  /** End-to-end trained-IVF ANN: run `iters` Lloyd rounds
    * ([[kmeansTrain]]), assign every vector to its max-cosine TRAINED
    * centroid, then exact top-`k` cosine rerank within cells — the
    * full FAISS-style `train -> assign -> search` pipeline as one op.
    * Versus [[ivfNearestNeighbors]] (raw pivot cells), trained cells
    * track the data distribution, which is what makes IVF recall
    * usable at small nCells.
    *
    * Scale shape: training as [[kmeansTrain]]; the search adds one
    * self-join shuffle on the cell id (intra-cell pairs only) and a
    * bounded per-cell window — the s05 shape with a zero-shuffle
    * assignment in front.
    */
  def ivfNearestNeighborsTrained(df: DataFrame, idCol: String, vecCol: String,
                                 nCells: Int, k: Int, iters: Int,
                                 portablePivots: Boolean = false): DataFrame = {
    require(iters > 0, "iters must be positive")
    // pinned (r19): per-round collects + the final assignment all
    // re-scanned the corpus; the assignment additionally feeds an
    // intra-cell SELF-join (two more evaluations) — pin both
    val base = kmBase(df, idCol, vecCol).localCheckpoint(true)
    var cents = kmInitPivots(df, idCol, vecCol, nCells, portablePivots)
    for (_ <- 1 to iters) cents = kmCollect(kmUpdate(base, cents))
    val assigned = base.select(col("id"), col("vec"), col("nrm"),
      kmBestCell(cents).as("cell"))
      .localCheckpoint(true)
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("nrm").as("nrm_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("nrm").as("nrm_b"))
    val scored = a.join(b, Seq("cell"))
      .where(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (dot(col("vec_a"), col("vec_b")) / (col("nrm_a") * col("nrm_b"))).as("cos"))
    val w = Window.partitionBy("id_a").orderBy(col("cos").desc, col("id_b"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "cos")
  }

  /** Distance-to-centroid embedding OUTLIER report — the corpus-hygiene
    * step a training pipeline runs before contrastive/embedding
    * training: vectors far from every trained cluster center are
    * mislabeled, corrupt, or out-of-distribution candidates. Trains
    * `iters` Lloyd rounds ([[kmeansTrain]]), assigns each vector to its
    * max-cosine centroid (zero-shuffle fold), then per cell computes
    * the similarity z-score and flags the bottom `pct` fraction by
    * RANK (integer-deterministic; the z threshold itself would sit on
    * an IEEE boundary). Output: (id, cell, sim, z, is_outlier).
    *
    * Scale shape: training as [[kmeansTrain]]; scoring adds one
    * partial-agg shuffle for per-cell moments (broadcast back) and a
    * per-(cell, sim-bucket) rank through the PrefixSum kernel — per-
    * task sorts stay bounded regardless of how far cells outgrow a
    * partition (round 17; the old per-cell window carried exactly
    * that caveat).
    *
    * Reference anchor: beyond-reference op (the reference has no
    * vector surface); SemDeDup-adjacent (arXiv:2303.09540) cluster
    * machinery reused for outlier scoring.
    */
  def embeddingOutliers(df: DataFrame, idCol: String, vecCol: String,
                        nCells: Int, iters: Int, pct: Double = 0.1,
                        portablePivots: Boolean = false): DataFrame = {
    require(iters > 0, "iters must be positive")
    require(pct > 0.0 && pct < 1.0, "pct must be in (0, 1)")
    // pinned (r19): rounds + scoring re-scanned the corpus; `scored`
    // feeds both the per-cell moments and the rank kernel
    val base = kmBase(df, idCol, vecCol).localCheckpoint(true)
    var cents = kmInitPivots(df, idCol, vecCol, nCells, portablePivots)
    for (_ <- 1 to iters) cents = kmCollect(kmUpdate(base, cents))
    val best = kmBest(cents)
    val scored = base.select(col("id"),
      best.getField("cell").as("cell"), best.getField("sim").as("sim"))
      .localCheckpoint(true)
    // per-cell moments: mu/var from UNROUNDED avgs, then 6-dp snapped —
    // z is computed off the snapped stats so both engines divide
    // identical inputs (cf. kmUpdate's snapping contract)
    val stats = scored.groupBy("cell").agg(
        avg(col("sim")).as("_mu_raw"),
        avg(col("sim") * col("sim")).as("_m2_raw"),
        count(lit(1)).as("n_cell"))
      .select(col("cell"), col("n_cell"),
        round(col("_mu_raw"), 6).as("mu"),
        round(col("_m2_raw") - col("_mu_raw") * col("_mu_raw"), 6).as("vr"))
    // per-cell rank via the PrefixSum kernel: nCells is a parameter,
    // so a bare partitionBy(cell) rank sorts N/nCells rows in one
    // task when cells outgrow a partition (the caveat the scaladoc
    // used to carry). sim ∈ [-1, 1] and the bucket cut floor(sim·2048)
    // is monotone in the rank order, so per-task sorts stay bounded
    // by the similarity distribution's bucket occupancy instead.
    val ranked = graft.ops.PrefixSum.groupedRowNumber(
      scored, Seq("cell"),
      order = Seq(col("sim").asc, col("id").asc),
      bucket = floor(col("sim") * lit(2048.0)).cast("long"), out = "rnk")
    ranked.join(broadcast(stats), Seq("cell"))
      .select(col("id"), col("cell"), col("sim"),
        when(col("vr") > 0.0,
          round((col("sim") - col("mu")) / sqrt(col("vr")), 6))
          .otherwise(lit(0.0)).as("z"),
        (col("rnk") <= ceil(lit(pct) * col("n_cell"))).cast("int").as("is_outlier"))
  }

  /** Product-quantization codebook TRAINING: per-subspace L2 k-means
    * (`iters` Lloyd rounds), the step that turns [[pqCodes]]'s
    * hash-picked codewords into real FAISS-style trained codebooks.
    * All `m` subspaces train in ONE plan per round: the m codebooks
    * ride as an indexed plan literal (`element_at` by subspace), so
    * assignment is a zero-shuffle argmin fold and the update is one
    * partial-agg (sub, cell, i) shuffle — m·k·subDim mean rows.
    * Same reproducibility contract as [[kmeansTrain]]: 6-dp-snapped
    * means make every round's input bit-identical cross-engine; L2
    * ties break to the lowest cell id. Init codebooks are the
    * hash-picked pivot vectors subsliced per subspace (exactly
    * [[pqCodes]]'s codebook, so `iters` rounds strictly refine what
    * s08 uses). Output: (sub, cell, i, c, n), i 1-based within the
    * subspace.
    */
  def pqTrain(df: DataFrame, idCol: String, vecCol: String,
              m: Int, nCentroids: Int, dim: Int, iters: Int,
              portablePivots: Boolean = false): DataFrame = {
    require(iters > 0, "iters must be positive")
    var cents = pqInit(df, idCol, vecCol, m, nCentroids, dim, portablePivots)
    // pinned (r19): each Lloyd round's collect re-ran the scan+explode
    val subs = pqSubs(df, idCol, vecCol, m, dim / m).localCheckpoint(true)
    for (_ <- 1 until iters) cents = pqCollect(pqUpdate(subs, cents), m)
    pqUpdate(subs, cents)
  }

  /** PQ codes against TRAINED codebooks — [[pqCodes]]'s hash-picked
    * codewords replaced by `iters` Lloyd rounds of [[pqTrain]]: the
    * full train→encode pipeline (FAISS `train` + `compute_codes`).
    * Same output shape and scale story as [[pqCodes]] — the encode
    * itself is a zero-shuffle argmin fold over the codebook literal,
    * so the oracle ordering shuffle is the only exchange.
    */
  def pqCodesTrained(df: DataFrame, idCol: String, vecCol: String,
                     m: Int, nCentroids: Int, dim: Int, iters: Int,
                     portablePivots: Boolean = false): DataFrame = {
    require(iters > 0, "iters must be positive")
    var cents = pqInit(df, idCol, vecCol, m, nCentroids, dim, portablePivots)
    // pinned (r19): rounds + the encode all re-ran the scan+explode
    val subs = pqSubs(df, idCol, vecCol, m, dim / m).localCheckpoint(true)
    for (_ <- 1 to iters) cents = pqCollect(pqUpdate(subs, cents), m)
    val best = pqBest(cents)
    subs.select(col("id"), col("sub"),
      best.getField("cell").as("code"),
      round(best.getField("d2"), 6).as("sq_err"))
  }

  /** IVF-PQ ANN with asymmetric distance computation (ADC) — the
    * FAISS `IndexIVFPQ` shape, the capstone of the ANN family:
    * candidates come from IVF cells ([[ivfAssign]]), but candidate
    * SCORING reads the m-byte PQ codes instead of raw vectors, via
    * the textbook per-query lookup table. At 100 TB this is the
    * operator that matters: the pair-scoring shuffle carries only
    * (id, sub, code) rows — never embeddings — and the doc side of
    * every distance is the compressed code, so the hot join touches
    * m bytes per doc.
    *
    * Stages (shuffle accounting in SCALE.md): train PQ codebooks
    * (`iters` Lloyd rounds, [[pqTrain]] internals), encode docs
    * (zero-shuffle argmin), build per-query LUTs — d2(query subvector,
    * codeword) for all m·k codewords, a broadcast join against the
    * m·k-row codebook — then intra-cell pairs sum m LUT entries per
    * candidate and take exact top-`k` per query on the APPROXIMATE
    * distance. Output: (id_a, rk, id_b, approx_d2), approx_d2 rounded
    * to 6 dp (the m-term sum is the one order-sensitive reduction).
    */
  def ivfPqNearestNeighbors(df: DataFrame, idCol: String, vecCol: String,
                            nCells: Int, m: Int, nCentroids: Int, dim: Int,
                            k: Int, iters: Int,
                            portablePivots: Boolean = false): DataFrame = {
    require(iters > 0, "iters must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // IVF cells over raw vectors (probes=1); pinned (r19) — the
    // candidate generation self-joins this frame (two legs)
    val cells = ivfAssign(df, idCol, vecCol, nCells, probes = 1, portablePivots)
      .select(col("cell"), col("id"))
      .localCheckpoint(true)
    // trained PQ codebooks + doc codes; subs pinned (r19) — the Lloyd
    // rounds, the encode, AND the per-query LUT build all consume it
    var cents = pqInit(df, idCol, vecCol, m, nCentroids, dim, portablePivots)
    val subs = pqSubs(df, idCol, vecCol, m, dim / m).localCheckpoint(true)
    for (_ <- 1 to iters) cents = pqCollect(pqUpdate(subs, cents), m)
    val codes = subs.select(col("id").as("id_b"), col("sub"),
      pqBest(cents).getField("cell").as("code"))
    // per-query LUT: d2(query subvector, codeword) for every codeword
    val cbRows = cents.zipWithIndex.flatMap { case (subCents, s) =>
      subCents.map { case (cell, cv) => (s, cell, cv.toSeq) }
    }
    val cb = cbRows.toDF("sub", "code", "cvec")
    val lutD2 = aggregate(
      zip_with(col("svec"), col("cvec"),
        (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (s, x) => s + x)
    val luts = subs.join(broadcast(cb), Seq("sub"))
      .select(col("id").as("id_a"), col("sub"), col("code"), lutD2.as("lut"))
    // intra-cell candidates score as m LUT lookups, never vectors
    val a = cells.select(col("cell"), col("id").as("id_a"))
    val b = cells.select(col("cell"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("cell")).where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
    val scored = pairs.join(codes, Seq("id_b"))
      .join(luts, Seq("id_a", "sub", "code"))
      .groupBy("id_a", "id_b")
      .agg(round(sum(col("lut")), 6).as("approx_d2"))
    val w = Window.partitionBy("id_a").orderBy(col("approx_d2"), col("id_b"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "approx_d2")
  }

  /** Two-stage ANN: IVF-PQ approximate shortlist → EXACT re-rank (the
    * production FAISS search shape: `nprobe`+ADC gives a cheap
    * shortlist, then full-precision vectors re-score only those
    * `shortlist` candidates per query). Recovers most of the recall
    * the PQ approximation loses while touching true vectors for
    * shortlist·n pairs instead of n²/cells.
    *
    * Scale shape: stage 1 is [[ivfPqNearestNeighbors]] (codes + LUTs,
    * vectors never cross the candidate shuffle); stage 2 joins the
    * raw vectors back by id for ONLY the shortlist pairs — two hash
    * joins keyed on ids, each shuffling shortlist·n narrow rows plus
    * one pass of the embeddings table. Output ranks by the exact
    * squared L2 (6-dp snapped, fixed-order sum) with id tiebreak.
    */
  def ivfPqRerankNeighbors(df: DataFrame, idCol: String, vecCol: String,
                           nCells: Int, m: Int, nCentroids: Int, dim: Int,
                           k: Int, shortlist: Int, iters: Int,
                           portablePivots: Boolean = false): DataFrame = {
    require(shortlist >= k, "shortlist must be at least k")
    val sl = ivfPqNearestNeighbors(df, idCol, vecCol, nCells, m, nCentroids,
      dim, k = shortlist, iters = iters, portablePivots = portablePivots)
      .select("id_a", "id_b", "approx_d2")
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val exactD2 = aggregate(
      zip_with(col("__va"), col("__vb"),
        (x, y) => (x.cast("double") - y.cast("double"))
          * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, d) => acc + d)
    val exact = sl.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("approx_d2"),
        round(exactD2, 6).as("exact_d2"))
    val w = Window.partitionBy("id_a").orderBy(col("exact_d2"), col("id_b"))
    exact.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "exact_d2", "approx_d2")
  }

  /** Top principal direction of the embedding cloud (un-centered,
    * about the origin) by POWER ITERATION on the Gram operator:
    * v ← Σᵢ xᵢ (xᵢ·v) / ‖·‖ — the covariance matrix is never
    * materialized; each round is one pass over the data (per-row dot
    * against the broadcast v, then a dim-keyed partial-agg of
    * xⱼ·y — dim rows total) plus a dim-sized driver collect, the
    * k-means/BPE driver-loop shape. The embedding-diagnostics op:
    * anisotropy/"dominant direction" checks, whitening prep, drift
    * of the spectrum's head.
    *
    * Determinism contract (same as the Lloyd trainers): per-round
    * component sums snap to 6 dp before normalization, and the
    * normalized loadings snap to 6 dp before the next round, so an
    * independent SQL replay reproduces every round bit-for-bit.
    * Output: one row per dimension (i, loading) plus the eigenvalue
    * estimate (final pre-normalization norm) and the share of total
    * squared mass it explains.
    */
  private def snap6(d: Double): Double =
    BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Driver-side power-iteration core shared by [[principalComponent]]
    * and [[removeTopComponent]]: returns the 6-dp-snapped unit
    * loadings plus the final pre-normalization norm (λ estimate).
    */
  private[ops] def principalDirection(df: DataFrame, idCol: String,
                                      vecCol: String, dim: Int, iters: Int)
      : (Array[Double], Double) = {
    require(iters > 0 && dim > 0, "positive dim/iters")
    val spark = df.sparkSession
    import spark.implicits._
    val x = df.select(col(idCol).as("id"),
      transform(col(vecCol), c => c.cast("double")).as("x"))
    var v: Array[Double] = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var lambda = 0.0
    for (_ <- 1 to iters) {
      val vCol = array(v.toIndexedSeq.map(lit): _*)
      val y = aggregate(zip_with(col("x"), vCol, (a, b) => a * b),
        lit(0.0), (acc, t) => acc + t)
      val sums = x.withColumn("y", y)
        .select(col("y"), posexplode(col("x")).as(Seq("j", "xj")))
        .groupBy("j").agg(round(sum(col("xj") * col("y")), 6).as("s"))
        .orderBy("j").as[(Int, Double)].collect()
      val s = sums.map(_._2)
      val nrm = math.sqrt(s.map(d => d * d).sum) // fixed-order, 64 terms
      lambda = nrm
      v = s.map(d => snap6(d / nrm))
    }
    (v, lambda)
  }

  def principalComponent(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (v, lambda) = principalDirection(df, idCol, vecCol, dim, iters)
    val x = df.select(
      transform(col(vecCol), c => c.cast("double")).as("x"))
    val tss = x.select(round(sum(aggregate(
        transform(col("x"), a => a * a), lit(0.0), (acc, t) => acc + t)), 6))
      .head().getDouble(0)
    val lambdaR = snap6(lambda)
    val share = snap6(lambdaR / tss)
    v.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i + 1, c, lambdaR, share) }
      .toDF("i", "loading", "eigenvalue", "explained_share")
  }

  /** "All-but-the-top" embedding cleanup (Mu & Viswanath 2018,
    * arXiv:1702.01417): remove the dominant common direction —
    * r = x − (x·v)v — which concentrates corpus-wide anisotropy and
    * hurts cosine retrieval. Reports each vector's projection onto
    * the top component and the residual norm; the projection column
    * doubles as the anisotropy outlier score.
    *
    * Scale shape: the direction comes from [[principalDirection]]
    * (iters bounded driver rounds); the cleanup itself is a narrow
    * per-row projection against the broadcast literal v — a 100 TB
    * corpus re-embeds in one scan.
    */
  def removeTopComponent(df: DataFrame, idCol: String, vecCol: String,
                         dim: Int, iters: Int): DataFrame = {
    val (v, _) = principalDirection(df, idCol, vecCol, dim, iters)
    val vCol = array(v.toIndexedSeq.map(lit): _*)
    val x = transform(col(vecCol), c => c.cast("double"))
    val proj = aggregate(zip_with(x, vCol, (a, b) => a * b),
      lit(0.0), (acc, t) => acc + t)
    df.select(col(idCol), proj.as("__proj"), x.as("__x"))
      .select(col(idCol), col("__proj"),
        sqrt(aggregate(zip_with(col("__x"), vCol,
          (a, b) => (a - col("__proj") * b) * (a - col("__proj") * b)),
          lit(0.0), (acc, t) => acc + t)).as("__rn"))
      .select(col(idCol), round(col("__proj"), 6).as("top_projection"),
        round(col("__rn"), 6).as("residual_norm"))
  }

  /** Init codebooks: hash-picked pivot vectors subsliced per subspace
    * (exactly [[pqCodes]]'s codebook — training strictly refines it).
    */
  private def pqInit(df: DataFrame, idCol: String, vecCol: String,
                     m: Int, nCentroids: Int, dim: Int,
                     portablePivots: Boolean): Seq[Seq[(Long, Array[Double])]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    require(nCentroids * dim <= 16384,
      s"nCentroids*dim = ${nCentroids * dim} exceeds the 16384 " +
        "codebook-literal bound; train per-partition subsets instead")
    val subDim = dim / m
    val pivotOrder =
      if (portablePivots) md5(col("pid").cast("string")) else xxhash64(col("pid"))
    val pivots: Seq[(Long, Array[Double])] = df
      .select(col(idCol).as("pid"), col(vecCol).as("pvec"))
      .orderBy(pivotOrder, col("pid")).limit(nCentroids)
      .select(col("pid"), transform(col("pvec"), x => x.cast("double")).as("pv"))
      .collect().toSeq
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    (0 until m).map { s =>
      pivots.map { case (pid, pv) => (pid, pv.slice(s * subDim, (s + 1) * subDim)) }
    }
  }

  private def pqSubs(df: DataFrame, idCol: String, vecCol: String,
                     m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(sequence(lit(0), lit(m - 1))).as("sub"), col(vecCol).as("vec"))
      .select(col("id"), col("sub"),
        slice(col("vec"), col("sub") * subDim + 1, lit(subDim)).as("svec"))

  /** L2 argmin struct(d2, cell) over the subspace's codebook, for a
    * frame exposing `sub`/`svec`. Strict < keeps the FIRST min —
    * cells sorted asc => low-id ties. The cast pins struct field
    * names/nullability on both branches: aliases inside this lambda
    * get stripped during resolution (unlike kmBestCell's
    * literal-array fold), and caseWhen then rejects the mismatched
    * struct types.
    */
  private def pqBest(cs: Seq[Seq[(Long, Array[Double])]]): Column = {
    val arrs = array(cs.map { subCents =>
      array(subCents.map { case (cell, cv) =>
        struct(lit(cell).as("cell"), array(cv.map(lit(_)): _*).as("cvec"))
      }: _*)
    }: _*)
    val mine = element_at(arrs, col("sub") + 1)
    def d2Of(cv: Column): Column = aggregate(
      zip_with(col("svec"), cv,
        (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (s, x) => s + x)
    val stype = "struct<d2:double,cell:bigint>"
    aggregate(mine,
      struct(lit(Double.PositiveInfinity), lit(Long.MaxValue)).cast(stype),
      (acc, c) => {
        val d = d2Of(c.getField("cvec"))
        when(d < acc.getField("d2"),
          struct(d, c.getField("cell")).cast(stype)).otherwise(acc)
      })
  }

  /** One Lloyd update over all m subspaces: broadcast-joined codebook
    * assignment + one partial-agg (sub, cell, i) shuffle of
    * 6-dp-snapped means.
    *
    * The codebook rides as DATA (a broadcast m·k-row frame), not as
    * literals baked into the expression tree: per-round literal
    * codebooks generate different whole-stage code every round and
    * force a fresh codegen compile per Lloyd iteration (measured:
    * the compile dominated s13's bench time at these corpus sizes) —
    * the joined shape keeps one stable plan whose generated code is
    * cached across rounds. Arithmetic is unchanged: the same
    * fixed-order zip d², and `min(struct(d2, cell))` keeps the
    * lowest cell on ties exactly like [[pqBest]]'s strict-< fold
    * over ascending cells (oracle-EXACT preserved, spec-pinned).
    */
  private def pqUpdate(subs: DataFrame,
                       cs: Seq[Seq[(Long, Array[Double])]]): DataFrame = {
    val spark = subs.sparkSession
    import spark.implicits._
    val cb = cs.zipWithIndex.flatMap { case (subCents, s) =>
      subCents.map { case (cell, cv) => (s, cell, cv.toSeq) }
    }.toDF("sub", "cell", "cvec")
    val d2 = aggregate(
      zip_with(col("svec"), col("cvec"),
        (a, b) => (a.cast("double") - b) * (a.cast("double") - b)),
      lit(0.0), (acc, x) => acc + x)
    subs.join(broadcast(cb), Seq("sub"))
      .groupBy(col("id"), col("sub"))
      .agg(min(struct(d2.as("d2"), col("cell").as("cell"))).as("b"),
        max(col("svec")).as("svec")) // svec constant per (id, sub)
      .select(col("sub"), col("b.cell").as("cell"),
        posexplode(col("svec")))
      .select(col("sub"), col("cell"), (col("pos") + 1).as("i"),
        col("col").cast("double").as("x"))
      .groupBy("sub", "cell", "i")
      .agg(round(avg(col("x")), 6).as("c"), count(lit(1)).as("n"))
  }

  private def pqCollect(update: DataFrame,
                        m: Int): Seq[Seq[(Long, Array[Double])]] = {
    val rows = update.select("sub", "cell", "i", "c").collect()
    (0 until m).map { s =>
      rows.filter(_.getInt(0) == s).toSeq
        .groupBy(_.getLong(1)).toSeq
        .map { case (cell, rs) =>
          (cell, rs.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray)
        }
        .sortBy(_._1)
    }
  }

  /** Symmetric int8 quantization report per vector: the compression
    * step a 100 TB embedding store runs before serving (4x smaller,
    * cache-resident ANN). For each vector: `scale = max|v| / 127`,
    * `q_i = floor(v_i/scale + 0.5)` (round-half-up, reproducible on
    * any IEEE engine — unlike banker's-rounding `round`), plus the
    * quantized checksum and the max absolute dequantization error.
    * Pure narrow scalar pipeline over the embedding column — zero
    * shuffles; every arithmetic step (float->double widening,
    * division, floor, multiply, compare) is deterministic IEEE, so
    * the report is hash-exact cross-engine.
    */
  /** SQ8 ANN with asymmetric distance computation — the scalar-
    * quantizer sibling of the PQ path (s15): the CORPUS is stored as
    * int8 codes + one scale per vector (s07's quantization, 4× the
    * memory cut of float32), queries stay full-precision, and the
    * score is the asymmetric dot `scale_b · Σ q_b[i]·query[i]` (the
    * FAISS `IndexScalarQuantizer` search shape). Queries are the s17
    * hash sample; candidates here are brute-force — compose with
    * [[ivfAssign]] cell gating for the 100 TB path exactly as s15
    * does, the scoring column is the same either way.
    *
    * Determinism: quantization is integer (floor(x/scale + 0.5));
    * the ADC fold is the same left-to-right double sum every s-family
    * oracle replays (list_sum order).
    *
    * Scale shape: the corpus streams with its codes (never
    * broadcast); only the sampled query block broadcasts; per-query
    * top-k prunes in-shuffle via WindowGroupLimit.
    */
  def sq8NearestNeighbors(df: DataFrame, idCol: String, vecCol: String,
                          k: Int = 3, sampleMod: Int = 20): DataFrame = {
    import graft.functions.PortableHash
    require(sampleMod >= 1, "sampleMod >= 1")
    val v = transform(col(vecCol), x => x.cast("double"))
    val base = df.select(col(idCol).as("id"), v.as("v"),
      (array_max(transform(v, x => abs(x))) / 127.0).as("scale"))
    val codes = base.select(col("id").as("id_b"), col("scale"),
      when(col("scale") === 0.0, transform(col("v"), _ => lit(0L)))
        .otherwise(transform(col("v"), x => floor(x / col("scale") + 0.5)))
        .as("q"))
    val queries = base
      .where(PortableHash.mdHash60(col("id").cast("string")) % sampleMod === 0)
      .select(col("id").as("id_a"), col("v").as("vec_a"))
    val scored = codes.join(broadcast(queries), col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("scale") * aggregate(
          zip_with(col("q"), col("vec_a"), (qi, ai) => qi.cast("double") * ai),
          lit(0.0), (acc, x) => acc + x)).as("adc"))
    val w = Window.partitionBy("id_a").orderBy(col("adc").desc, col("id_b"))
    scored.withColumn("rk", row_number().over(w)).where(col("rk") <= k)
      .select("id_a", "rk", "id_b", "adc")
  }

  def quantizeInt8Report(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val withScale = df.select(col(idCol), v.as("v"),
      (array_max(transform(v, x => abs(x))) / 127.0).as("scale"))
    // all-zero vector => scale 0: quantize to zeros rather than NaN
    val q = when(col("scale") === 0.0,
      transform(col("v"), _ => lit(0L)))
      .otherwise(transform(col("v"), x => floor(x / col("scale") + 0.5)))
    withScale.select(col(idCol), col("scale"),
      aggregate(q, lit(0L), (acc, x) => acc + x).as("sum_q"),
      array_max(zip_with(q, col("v"), (qi, vi) => abs(qi * col("scale") - vi)))
        .as("max_abs_err"))
  }
}
