package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed connected components — the step that turns near-dup
  * PAIRS into dedup CLUSTERS (one canonical document per component).
  *
  * Algorithm: min-label propagation with pointer jumping. Each
  * iteration (a) takes the min label over neighbors, (b) compresses
  * paths by replacing every label with its label's label. Pointer
  * jumping halves the remaining depth, so convergence is
  * O(log diameter) iterations — the property that makes iterative CC
  * viable on billion-node dedup graphs, where plain 1-hop propagation
  * would need diameter-many shuffles. Each iteration is two shuffles
  * (neighbor-min aggregation + compression join) on (long, long) rows.
  */
object GraphOps {

  /** Component label (minimum reachable id) for every node.
    *
    * @param edges undirected edge list, columns (`u`, `v`)
    * @param nodes one row per node, column `id` (isolated nodes keep
    *              their own id as label)
    * @return (`id`, `cluster_id`)
    */
  def connectedComponents(edges: DataFrame, nodes: DataFrame): DataFrame = {
    val spark = nodes.sparkSession
    // persist the DIRECTED edges before symmetrizing: the union's two
    // legs would otherwise each re-evaluate the caller's edge plan —
    // for dedup callers that plan is the expensive candidate join
    // (LSH bands / IVF cosine), so the double eval is a 2× tax on the
    // whole edge-generation stage. Edge rows are (long, long) — the
    // extra cached copy is noise next to recomputing the join.
    val directed = edges.select(col("u"), col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym = directed
      .union(directed.select(col("v").as("u"), col("u").as("v")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint truncates lineage each iteration — the
    // compression step references the previous frame twice, so without
    // truncation the logical plan doubles per iteration and the driver
    // OOMs long before the data does. (On a real cluster with a
    // checkpoint dir, `checkpoint` gives the same cut fault-tolerantly.)
    var labels = nodes.select(col("id"), col("id").as("lbl"))
      .localCheckpoint(true)
    var changed = 1L
    while (changed > 0) {
      // (a) min over own + neighbors' labels. The iteration-start
      // label rides along as `prev` so convergence detection below is
      // a scan of the checkpointed frame, not another shuffle join.
      val nbrMin = sym.join(labels, sym("v") === labels("id"))
        .groupBy(sym("u").as("nid")).agg(min(col("lbl")).as("nlbl"))
      val stepped = labels.join(nbrMin, labels("id") === nbrMin("nid"), "left")
        .select(labels("id"),
          least(labels("lbl"), coalesce(col("nlbl"), labels("lbl"))).as("lbl"),
          labels("lbl").as("prev"))
        .localCheckpoint(true)
      // (b) pointer jumping: lbl := lbl's current lbl (path compression).
      // LAZY checkpoint (r18): the convergence count right below is
      // the action that materializes it, so each iteration costs two
      // jobs (stepped's eager pin + this count) instead of three.
      // stepped itself must stay EAGER — `next` references it twice
      // (both join legs), and a lazy pin materialized by two sibling
      // stages of one job can race both into computing the partitions.
      val l2 = stepped.select(col("id").as("jid"), col("lbl").as("jlbl"))
      val next = stepped.join(l2, stepped("lbl") === l2("jid"), "left")
        .select(stepped("id"),
          coalesce(col("jlbl"), stepped("lbl")).as("lbl"),
          stepped("prev"))
        .localCheckpoint(false)
      changed = next.where(col("lbl") =!= col("prev")).count()
      // `next` is materialized by the count and no longer depends on
      // stepped — drop its blocks now, and the previous iteration's
      // labels with them. Without this, MEMORY_AND_DISK blocks
      // accumulate for the job lifetime on deep graphs (one superseded
      // frame per iteration).
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(stepped)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(labels)
      labels = next
    }
    sym.unpersist()
    directed.unpersist()
    labels.select(col("id"), col("lbl").as("cluster_id"))
  }

  /** Weighted PageRank by power iteration — crawl-frontier
    * prioritization over the (domain → domain) link graph: rank mass
    * flows along edges proportionally to link weight, damped, with
    * dangling mass redistributed uniformly so total rank stays 1.
    *
    *   r'(v) = (1-d)/N + d·( Σ_u r(u)·w(u,v)/out(u) + dangling/N )
    *
    * Each of the `iters` rounds is ONE shuffle join of the (node,rank)
    * frame against the edge list plus a key-grouped sum — rank rows
    * are (string, double), edges never rebuild, so a billion-edge
    * domain graph pays iters·|edges| join work and nothing quadratic.
    * Ranks are snapped to 9 dp each round (same contract as
    * [[graft.ops.VectorOps]]' Lloyd rounds): the NEXT round's input is
    * bit-identical on any engine, so an oracle can replay the
    * iteration exactly; order-dependent double summation inside one
    * round is the documented measure-zero risk shared with p09.
    *
    * Convergence: with `tol` set, iteration stops as soon as the max
    * per-node rank change of a round is ≤ tol — the delta is read from
    * the round's already-localCheckpointed frame (the previous rank
    * rides along as `prev`, the CC loop's convergence-read pattern), so
    * early-stop costs one scalar scan of materialized rows per round,
    * not a recompute. `tol = None` (the oracle mode) runs exactly
    * `iters` rounds — bit-identical to the pre-early-stop behavior.
    *
    * @param edges  (`u`, `v`, `w`) directed weighted edges; parallel
    *               edges should be pre-aggregated into `w`
    * @return (`node`, `rank`) for every node appearing as src or dst
    */
  def pageRank(edges: DataFrame, iters: Int,
               damping: Double = 0.85,
               tol: Option[Double] = None): DataFrame =
    pageRankRounds(edges, iters, damping, tol)._1

  /** [[pageRank]] plus the number of rounds actually run — the
    * observable the early-stop spec asserts on.
    */
  def pageRankRounds(edges: DataFrame, iters: Int,
                     damping: Double = 0.85,
                     tol: Option[Double] = None): (DataFrame, Int) = {
    require(iters > 0, "iters must be positive")
    require(tol.forall(_ > 0), "tol must be positive")
    val e = edges.select(col("u").cast("string").as("u"),
      col("v").cast("string").as("v"), col("w").cast("double").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // normalized out-weights: each edge carries the FRACTION of its
    // source's rank it transports — computed once, reused every round
    val outW = e.groupBy(col("u")).agg(sum(col("w")).as("ow"))
    val frac = e.join(outW, Seq("u"))
      .select(col("u"), col("v"), (col("w") / col("ow")).as("f"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("u")).union(e.select(col("v").as("u")))
      .distinct().select(col("u").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val hasOut = outW.select(col("u").as("node"))

    var ranks = nodes.select(col("node"),
      round(lit(1.0) / n, 9).as("rank")).localCheckpoint(true)
    var rounds = 0
    var converged = false
    // Round frames are LAZY checkpoints (r18): each round already runs
    // a one-double driver read (the dangling-mass scalar, and the tol
    // delta when early-stop is on), and that action materializes the
    // round's frame through its predecessor's still-live cache — a
    // separate eager-checkpoint job per round only re-did that work.
    // A predecessor's blocks may only be dropped AFTER some action has
    // materialized its successor (lineage is truncated at the
    // checkpoint, so an early drop would be unrecoverable) — hence the
    // one-round-delayed unpersist.
    var pendingUnpersist: Option[DataFrame] = None
    while (rounds < iters && !converged) {
      // dangling nodes hold rank but transport none through edges;
      // their mass re-enters uniformly (the standard teleport fix)
      // scalar per round, same class as the CC loop's convergence
      // count — a one-double driver read, not a data-plane collect.
      // This read is also what materializes a lazily-checkpointed
      // `ranks` from the previous round.
      val dangling = ranks.join(hasOut, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("m"))
        .head().getDouble(0)
      pendingUnpersist.foreach(
        org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint)
      pendingUnpersist = None
      val inbound = frac.join(ranks, frac("u") === ranks("node"))
        .groupBy(frac("v").as("node"))
        .agg(sum(col("rank") * col("f")).as("m"))
      // ranks is the spine (it covers every node, invariantly), so the
      // outgoing rank can ride along as `prev` for the delta read
      val next = ranks.select(col("node"), col("rank").as("prev"))
        .join(inbound, Seq("node"), "left")
        .select(col("node"),
          round(lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("m"), lit(0.0)) + lit(dangling / n)),
            9).as("rank"),
          col("prev"))
        .localCheckpoint(false)
      rounds += 1
      converged = tol.exists { t =>
        next.agg(max(abs(col("rank") - col("prev"))))
          .head().getDouble(0) <= t
      }
      pendingUnpersist = Some(ranks)
      ranks = next
    }
    // the final round's frame may still be unmaterialized — pin it
    // before its (truncated-lineage) inputs are dropped below
    ranks.count()
    pendingUnpersist.foreach(
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint)
    e.unpersist(); frac.unpersist(); nodes.unpersist()
    (ranks.select(col("node"), col("rank")), rounds)
  }

  /** HITS hubs & authorities (Kleinberg) by power iteration — the
    * complement of [[pageRank]] for seed-quality scoring: a good HUB
    * links to many good authorities (a crawl seed list), a good
    * AUTHORITY is linked from many good hubs (a canonical source).
    *
    *   a'(v) = Σ_{u→v} h(u)·w(u,v)      (then L1-normalize)
    *   h'(u) = Σ_{u→v} a'(v)·w(u,v)     (then L1-normalize)
    *
    * Same oracle-replay contract as [[pageRank]]: every half-step
    * snaps to 9 dp (raw scores, then normalized scores), so the next
    * step's input is bit-identical on any engine and a SQL oracle can
    * unroll the iteration. L1 (sum) normalization instead of the
    * textbook L2 keeps the oracle to exact +/× on snapped values —
    * the relative ORDER of scores is identical under either norm.
    *
    * Scale: each half-step is ONE shuffle join of the (node, score)
    * frame against the edge list plus a key-grouped sum — score rows
    * are (string, double), edges persist once, so a billion-edge graph
    * pays 2·iters·|edges| join work and nothing quadratic. The L1
    * total is a one-double driver read per half-step (the dangling-
    * mass pattern), not a data-plane collect.
    *
    * @param edges (`u`, `v`, `w`) directed weighted edges; parallel
    *              edges should be pre-aggregated into `w` (weights > 0)
    * @return (`node`, `hub`, `auth`) for every node in the graph
    */
  /** Synchronous label propagation (Raghavan et al. 2007), the
    * fixed-round deterministic variant: labels start as node ids;
    * each round every node adopts the neighbor label with the
    * greatest incident edge weight, ties to the SMALLEST label. The
    * argmax is ONE partial-agg `min(struct(-s, lbl))` per round — no
    * per-node sorts — and fixed rounds + total tie order make the
    * result engine-reproducible (u12's oracle unrolls the same
    * rounds). Input edges are treated as undirected (symmetrized,
    * parallel edges summed); callers use integer-count weights, so
    * the weight sums are double-exact. Per-round shuffle is |edges|
    * label lookups + a node-key agg — the u06 round shape.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds > 0, "rounds must be positive")
    val dir0 = edges.select(col("u").cast("string").as("u"),
      col("v").cast("string").as("v"), col("w").cast("double").as("w"))
    val und = dir0
      .unionAll(dir0.select(col("v").as("u"), col("u").as("v"), col("w")))
      .groupBy("u", "v").agg(sum(col("w")).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = und.select(col("u").as("node")).distinct()
    var labels = nodes.select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val nbr = und
        .join(labels.select(col("node").as("v"), col("lbl").as("nl")),
          Seq("v"))
        .groupBy("u", "nl").agg(sum(col("w")).as("s"))
      val prev = labels
      labels = nbr.groupBy("u")
        .agg(min(struct((col("s") * -1).as("ns"), col("nl"))).as("m"))
        .select(col("u").as("node"), col("m.nl").as("lbl"))
        .localCheckpoint(true)
      prev.unpersist()
    }
    und.unpersist()
    labels
  }

  def hits(edges: DataFrame, iters: Int): DataFrame = {
    require(iters > 0, "iters must be positive")
    val e = edges.select(col("u").cast("string").as("u"),
      col("v").cast("string").as("v"), col("w").cast("double").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("u")).union(e.select(col("v").as("u")))
      .distinct().select(col("u").as("node"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()

    // one normalized propagation half-step: score flows across `ekey`
    // (u→v for authorities, v→u for hubs), snaps, L1-normalizes, snaps
    def halfStep(score: DataFrame, scoreCol: String,
                 from: String, to: String, outCol: String): DataFrame = {
      val flowed = e.join(score, e(from) === score("node"))
        .groupBy(e(to).as("node"))
        .agg(sum(col(scoreCol) * col("w")).as("s"))
      // lazy checkpoint (r18): the L1-total read right below is the
      // action that materializes it — was a separate eager job
      val raw = nodes.join(flowed, Seq("node"), "left")
        .select(col("node"), round(coalesce(col("s"), lit(0.0)), 9).as("raw"))
        .localCheckpoint(false)
      val total = raw.agg(sum(col("raw"))).head().getDouble(0)
      val out = raw
        .select(col("node"), round(col("raw") / lit(total), 9).as(outCol))
        .localCheckpoint(true)
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(raw)
      out
    }

    var hub = nodes.select(col("node"), round(lit(1.0) / n, 9).as("hub"))
      .localCheckpoint(true)
    var auth: DataFrame = null
    var i = 0
    while (i < iters) {
      val authNext = halfStep(hub, "hub", "u", "v", "auth")
      if (auth != null)
        org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(auth)
      auth = authNext
      val hubNext = halfStep(auth, "auth", "v", "u", "hub")
      org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(hub)
      hub = hubNext
      i += 1
    }
    val res = hub.join(auth, Seq("node")).select(col("node"), col("hub"), col("auth"))
    e.unpersist(); nodes.unpersist()
    res
  }

  /** Per-node triangle counts + local clustering coefficient over an
    * undirected simple graph (self-loops and parallel/reverse
    * duplicates removed here). Degree-ORIENTED wedge join — the
    * standard skew-safe distributed algorithm: direct every edge from
    * its lower-(degree, node) endpoint to the higher one, enumerate
    * wedges only at each edge's LOW endpoint, and close them against
    * the oriented edge set. Orientation caps every node's out-degree
    * at O(√m), so the wedge fan-out is Σ outdeg² ≤ O(m^1.5) total and
    * no single hub explodes a partition — the property that lets this
    * run on a billion-edge web graph where naive neighbor-pair
    * enumeration at hubs is quadratic. Three hash shuffles (degree,
    * wedge, close), all on node keys.
    *
    * Output: (node, degree, n_triangles, clustering) with
    * clustering = 2T / (d·(d−1)) rounded to 6 dp (0.0 for d < 2 — a
    * defined value, not NULL, so engine NULL/NaN conventions can't
    * desynchronize a report that is otherwise exact integers), one
    * row per node including triangle-free ones.
    */
  def triangleStats(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    // canonical undirected simple edges a < b
    val und = edges.select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient each edge low→high in the (deg, node) total order; carry
    // the dst's order key for the wedge-side rank compare
    val withDegs = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
    val oriented = withDegs.select(
        when(col("da") < col("db")
          || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(
            struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // wedges at the low endpoint: (v, w) with rank(v) < rank(w), both
    // out-neighbors of u — then close with the oriented edge v→w
    val o1 = oriented.select(col("u"), col("v"), col("dv"))
    val o2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = o1.join(o2, Seq("u"))
      .where(col("dv") < col("dw")
        || (col("dv") === col("dw") && col("v") < col("w")))
    val triangles = wedges
      .join(oriented.select(col("u").as("v"), col("v").as("w")),
        Seq("v", "w"), "left_semi")
      .select(col("u"), col("v"), col("w"))
    val perNode = triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    // materialize before dropping the cached frames the plan reads
    // (the CC loop's checkpoint-then-unpersist pattern)
    val res = deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          round(lit(2.0) * coalesce(col("n_triangles"), lit(0L))
            / (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
      .orderBy("node")
      .localCheckpoint(true)
    oriented.unpersist()
    und.unpersist()
    res
  }
}
