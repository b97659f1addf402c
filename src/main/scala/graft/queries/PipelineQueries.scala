package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.SampleOps

/** Deterministic sampling / splitting surface — the dataset-versioning
  * ops of a training pipeline (stable under reruns and appends).
  */
object PipelineQueries {

  val all: Seq[Q] = Seq(

    // ── hash split: leak-free train/val/test assignment ─────────────
    Q("p01_hash_split",
      (s, dir) => SampleOps.hashSplit(Tables.documents(s, dir), "doc_id",
        Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
        .select("doc_id", "split")
        .orderBy("doc_id"),
      Some("""WITH u AS (
          SELECT doc_id,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM documents)
        SELECT doc_id,
          CASE WHEN uh < 8.0/10 THEN 'train'
               WHEN uh < 8.0/10 + 1.0/10 THEN 'val'
               ELSE 'test' END AS split
        FROM u ORDER BY doc_id""")),

    // ── perplexity-filtered split (CCNet shape): trigram-LM score →
    //    threshold on the 6-dp snapped cross-entropy → leak-stable
    //    hash split of the survivors. Oracle = t16's CTE chain with
    //    the filter + p01's split fragment on top. ───────────────────
    Q("p14_perplexity_split",
      (s, dir) => SampleOps.perplexitySplit(Tables.documents(s, dir),
        "doc_id", "text", maxCrossEntropy = 3.0,
        Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
        .orderBy("doc_id"),
      Some("""WITH ts AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tri AS (
          SELECT doc_id, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
          FROM (SELECT doc_id, t, UNNEST(range(1, len(t) - 1)) AS i FROM ts)),
        big AS (
          SELECT t[i] AS w1, t[i + 1] AS w2
          FROM (SELECT t, UNNEST(range(1, len(t))) AS i FROM ts)),
        c1 AS (
          SELECT w, COUNT(*) AS nw
          FROM (SELECT UNNEST(t) AS w FROM ts) GROUP BY w),
        tot AS (SELECT CAST(SUM(nw) AS DOUBLE) AS n FROM c1),
        c2 AS (SELECT w1, w2, COUNT(*) AS nbg FROM big GROUP BY w1, w2),
        c3 AS (SELECT w1, w2, w3, COUNT(*) AS ntg FROM tri GROUP BY w1, w2, w3),
        sc AS (
          SELECT tr.doc_id,
            ROUND(AVG(-LN(
              0.6 * CAST(c3.ntg AS DOUBLE) / cctx.nbg
              + 0.3 * CAST(c23.nbg AS DOUBLE) / cb.nw
              + (1.0 - 0.6 - 0.3) * CAST(cc.nw AS DOUBLE) / tot.n)), 6)
              AS cross_entropy
          FROM tri tr
          JOIN c3 ON c3.w1 = tr.w1 AND c3.w2 = tr.w2 AND c3.w3 = tr.w3
          JOIN c2 cctx ON cctx.w1 = tr.w1 AND cctx.w2 = tr.w2
          JOIN c2 c23 ON c23.w1 = tr.w2 AND c23.w2 = tr.w3
          JOIN c1 cb ON cb.w = tr.w2
          JOIN c1 cc ON cc.w = tr.w3
          CROSS JOIN tot
          GROUP BY tr.doc_id),
        u AS (
          SELECT doc_id, cross_entropy,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM sc WHERE cross_entropy <= 3.0)
        SELECT doc_id, cross_entropy,
          CASE WHEN uh < 8.0/10 THEN 'train'
               WHEN uh < 8.0/10 + 1.0/10 THEN 'val'
               ELSE 'test' END AS split
        FROM u ORDER BY doc_id""")),

    // ── deterministic k-fold assignment (cross-validation shards);
    //    engine-hash flavor, signed long-key XXH64 replayed in SQL ────
    Q("p13_kfold",
      (s, dir) => SampleOps.kFold(Tables.documents(s, dir), "doc_id", k = 5)
        .select("doc_id", "fold")
        .orderBy("doc_id"),
      Some(s"""WITH keys AS (
          SELECT doc_id, doc_id::HUGEINT AS k FROM documents),
        ${XxHashSql.keyHashSignedCtes("doc_id")}
        SELECT doc_id, ((hv % 5) + 5) % 5 AS fold
        FROM key_hash_signed ORDER BY doc_id""")),

    // ── deterministic Bernoulli sample (narrow, pushdown-friendly) ──
    Q("p02_sample_hash",
      (s, dir) => SampleOps.sampleByHash(Tables.events(s, dir), "event_id", 0.1)
        .select("event_id", "event_type", "value")
        .orderBy("event_id"),
      Some("""SELECT event_id, event_type, value
        FROM events
        WHERE ('0x' || substr(md5('#' || event_id::VARCHAR), 1, 15))::BIGINT
          / 1152921504606846976.0 < 0.1
        ORDER BY event_id""")),

    // ── per-group deterministic sample (reservoir stand-in) ─────────
    Q("p03_sample_per_group",
      (s, dir) => SampleOps.samplePerGroup(Tables.events(s, dir),
        "event_type", "event_id", n = 100)
        .select("event_type", "event_id")
        .orderBy("event_type", "event_id"),
      Some("""WITH u AS (
          SELECT event_type, event_id,
            ('0x' || substr(md5('#' || event_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM events),
        ranked AS (
          SELECT event_type, event_id,
            ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY uh, event_id) AS rk
          FROM u)
        SELECT event_type, event_id FROM ranked WHERE rk <= 100
        ORDER BY event_type, event_id""")),

    // ── balanced downsampling: every group capped at the smallest
    //    group's size (derived lazily, broadcast 1-row minimum) ───────
    Q("p04_balance",
      (s, dir) => SampleOps.balancePerGroup(
        Tables.documents(s, dir).where(col("n_chars") >= 300),
        "source", "doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""WITH f AS (
          SELECT doc_id, source FROM documents WHERE n_chars >= 300),
        c AS (SELECT source, COUNT(*) AS n FROM f GROUP BY source),
        m AS (SELECT MIN(n) AS mn FROM c),
        u AS (
          SELECT doc_id, source,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM f),
        r AS (
          SELECT doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY source ORDER BY uh, doc_id) AS rk
          FROM u)
        SELECT doc_id, source FROM r, m WHERE rk <= mn
        ORDER BY doc_id""")),

    // ── mixture sampling: per-source keep fractions → target corpus
    //    composition; narrow filter, append-stable ────────────────────
    Q("p05_mixture",
      (s, dir) => SampleOps.mixtureSample(Tables.documents(s, dir),
        "source", "doc_id",
        Seq("src0" -> 0.9, "src1" -> 0.25, "src2" -> 0.6),
        defaultFraction = 0.1, salt = "mix")
        .select("doc_id", "source")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source FROM documents
        WHERE ('0x' || substr(md5('mix#' || doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0
          < CASE source WHEN 'src0' THEN 0.9 WHEN 'src1' THEN 0.25
                        WHEN 'src2' THEN 0.6 ELSE 0.1 END
        ORDER BY doc_id""")),

    // ── leak-free (cluster-aware) split: hash the near-dup CLUSTER,
    //    not the doc, so paraphrases can never straddle train/test ────
    Q("p11_leakfree_split",
      (s, dir) => {
        val labels = graft.ops.TextOps.dedupClusters(
          Tables.documents(s, dir), "doc_id", "text", 0.9)
          .select("doc_id", "cluster_id")
        SampleOps.hashSplit(labels, "cluster_id",
          Seq("train" -> 8.0, "test" -> 2.0), salt = "cs")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE tok AS (
          SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
          FROM documents),
        cnt AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
        cp AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM cp
          JOIN cnt ca ON ca.doc_id = id_a
          JOIN cnt cb ON cb.doc_id = id_b
          WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common) >= 0.9),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node),
        lab AS (
          SELECT node AS doc_id, MIN(lbl) AS cluster_id
          FROM reach GROUP BY node)
        SELECT doc_id, cluster_id,
          CASE WHEN ('0x' || substr(md5('cs#' || cluster_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 < 8.0/10
            THEN 'train' ELSE 'test' END AS split
        FROM lab ORDER BY doc_id""")),

    // ── leak-free split over the PRODUCTION cluster path: same
    //    contract as p11, but the cluster labels come from
    //    MinHash+LSH candidate edges (d06) instead of exact Jaccard
    //    pairs — the linear 100 TB path, now oracle-gated itself
    //    rather than a doc note. Oracle = d06's fixpoint CTE chain +
    //    p01's split fragment keyed on the cluster id. ───────────────
    Q("p12_leakfree_split_lsh",
      (s, dir) => {
        val labels = graft.ops.TextOps.dedupClustersMinHash(
          Tables.documents(s, dir), "doc_id", "text",
          numHashes = 16, bands = 2, minEstimate = 0.7, portable = true)
          .select("doc_id", "cluster_id")
        SampleOps.hashSplit(labels, "cluster_id",
          Seq("train" -> 8.0, "test" -> 2.0), salt = "cs")
          .orderBy("doc_id")
      },
      Some("""WITH RECURSIVE toks AS (
          SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
          FROM documents),
        sig AS (
          SELECT doc_id, i,
            MIN(((('0x' || substr(md5('a' || i::VARCHAR), 1, 7))::BIGINT + 1)
              * (('0x' || substr(md5(tok), 1, 15))::BIGINT % 2147483647)
              + ('0x' || substr(md5('b' || i::VARCHAR), 1, 7))::BIGINT)
              % 2147483647) AS mh
          FROM toks CROSS JOIN range(16) t(i)
          GROUP BY doc_id, i),
        band AS (
          SELECT doc_id, i // 8 AS band,
            string_agg(mh::VARCHAR, ',' ORDER BY i) AS bsig
          FROM sig GROUP BY doc_id, i // 8),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig
            AND a.doc_id < b.doc_id),
        agree AS (
          SELECT c.id_a, c.id_b,
            COUNT(CASE WHEN sa.mh = sb.mh THEN 1 END) AS n_agree
          FROM cand c
          JOIN sig sa ON sa.doc_id = c.id_a
          JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
          GROUP BY 1, 2),
        pairs AS (
          SELECT id_a, id_b FROM agree
          WHERE CAST(n_agree AS DOUBLE) / 16 >= 0.7),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM pairs
          UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
        reach(node, lbl) AS (
          SELECT doc_id, doc_id FROM documents
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node),
        lab AS (
          SELECT node AS doc_id, MIN(lbl) AS cluster_id
          FROM reach GROUP BY node)
        SELECT doc_id, cluster_id,
          CASE WHEN ('0x' || substr(md5('cs#' || cluster_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 < 8.0/10
            THEN 'train' ELSE 'test' END AS split
        FROM lab ORDER BY doc_id""")),

    // ── quality-weighted (importance) sampling: keep probability =
    //    scaled quality score, no cliff threshold ─────────────────────
    Q("p10_weighted_sample",
      (s, dir) => {
        val score = graft.ops.TextOps
          .qualityColumns(col("text"), Seq("the", "a", "of", "to"))
          .find(_._1 == "quality_score").get._2
        SampleOps.weightedSampleByHash(Tables.documents(s, dir),
          "doc_id", score, scale = 0.15, salt = "wq")
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, source FROM documents
        WHERE ('0x' || substr(md5('wq#' || doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0
          < LEAST(GREATEST(
              ((CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                  / len(string_split(text, ' ')))
                * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                    t -> t IN ('the', 'a', 'of', 'to'))) AS DOUBLE)
                  / len(string_split(text, ' ')))) * 0.15, 0.0), 1.0)
        ORDER BY doc_id""")),

    // ── temperature-flattened mixture: keep fraction derived from
    //    group counts (n_g^alpha), low-resource langs upweighted ─────
    Q("p09_temperature_mixture",
      (s, dir) => SampleOps.temperatureMixture(Tables.documents(s, dir),
        "lang", "doc_id", alpha = 0.5, totalBudget = 250L, salt = "temp")
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some("""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        t AS (SELECT SUM(pow(n, 0.5)) AS z FROM c),
        f AS (SELECT lang,
          least(1.0, 250.0 * pow(n, 0.5) / z / n) AS kf
          FROM c CROSS JOIN t)
        SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
        WHERE ('0x' || substr(md5('temp#' || d.doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0 < f.kf
        ORDER BY doc_id""")),

    // ── token-budget mixture: the recipe written in TOKENS — keep
    //    fraction = min(1, budget/total_tokens) per group, derived
    //    from one bounded agg and broadcast back; unlisted langs
    //    (fr/de here) drop entirely, exercising the null path ─────────
    Q("p16_token_budget",
      (s, dir) => SampleOps.tokenBudgetMixture(Tables.documents(s, dir),
        "lang", "doc_id", graft.ops.TextOps.tokenCount(col("text")),
        Seq("en" -> 2000L, "zh" -> 500L, "es" -> 300L), salt = "tb")
        .select("doc_id", "lang")
        .orderBy("doc_id"),
      Some("""WITH c AS (
          SELECT lang,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tot
          FROM documents GROUP BY lang),
        f AS (SELECT lang,
          CASE WHEN lang IN ('en', 'zh', 'es')
            THEN least(1.0, (CASE lang WHEN 'en' THEN 2000.0
              WHEN 'zh' THEN 500.0 WHEN 'es' THEN 300.0 END) / tot)
          END AS kf
          FROM c)
        SELECT d.doc_id, d.lang FROM documents d JOIN f USING (lang)
        WHERE ('0x' || substr(md5('tb#' || d.doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0 < f.kf
        ORDER BY doc_id""")),

    // ── shard-local sequence packing into ~budget-token bins ────────
    Q("p07_pack",
      (s, dir) => SampleOps.packByBudget(Tables.documents(s, dir),
        "source", "doc_id",
        graft.ops.TextOps.tokenCount(col("text")), budget = 500L)
        .select("doc_id", "source", "n_tokens", "bin_id")
        .orderBy("doc_id"),
      Some("""WITH t AS (
          SELECT doc_id, source,
            CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, source, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) AS cum
          FROM t)
        SELECT doc_id, source, n_tokens,
          CAST((cum - n_tokens) // 500 AS BIGINT) AS bin_id
        FROM c ORDER BY doc_id""")),

    // ── the full preprocessing funnel as ONE Catalyst plan: quality
    //    gate → exact dedup → decontamination → mixture sampling.
    //    Composition is the point: filters/pruning flow through every
    //    stage, nothing materializes in between. ──────────────────────
    Q("p06_funnel",
      (s, dir) => {
        import graft.functions.PortableSketches.ngramHashes60
        import graft.ops.TextOps
        // fan out the single-row-group local corpus (see t08's note)
        val docs = Tables.documents(s, dir)
          .repartition(s.sparkContext.defaultParallelism)
        val qual = docs.where(TextOps.tokenCount(col("text")) >= 40)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(md5(col("text")))
        val deduped = qual.withColumn("_keep", min(col("doc_id")).over(w))
          .where(col("doc_id") === col("_keep")).drop("_keep")
        val evalNgh = docs.where(col("doc_id") % 19 === 3)
          .select(explode(ngramHashes60(col("text"), 5)).as("ngh")).distinct()
        val train = deduped.where(col("doc_id") % 19 =!= 3)
        // contamination is computed from the PRE-dedup quality set:
        // equivalent under the anti-join below (ids of dropped dup
        // copies simply never match), and it keeps the dedup window
        // out of the n-gram branch's lineage, so the two expensive
        // shuffles run independently instead of back-to-back
        // (measured 7.5s → 2.4s at sf0.1).
        val contaminated = qual.where(col("doc_id") % 19 =!= 3)
          .select(col("doc_id"), explode(ngramHashes60(col("text"), 5)).as("ngh"))
          .join(broadcast(evalNgh), "ngh")
          .select("doc_id").distinct()
        val clean = train.join(contaminated, Seq("doc_id"), "left_anti")
        SampleOps.mixtureSample(clean, "source", "doc_id",
          Seq("src0" -> 1.0, "src1" -> 0.5), defaultFraction = 0.3, salt = "mix")
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some("""WITH qual AS (
          SELECT doc_id, source, text FROM documents
          WHERE len(string_split(text, ' ')) >= 40),
        ded AS (
          SELECT doc_id, source, text FROM (
            SELECT doc_id, source, text,
              MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep
            FROM qual) WHERE doc_id = keep),
        evn AS (
          SELECT DISTINCT ('0x' || substr(md5(ng), 1, 15))::BIGINT AS ngh FROM (
            SELECT UNNEST(list_distinct(list_transform(range(1, len(toks) - 3),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4]))) AS ng
            FROM (SELECT string_split(text, ' ') AS toks
                  FROM documents WHERE doc_id % 19 = 3))),
        train AS (SELECT * FROM ded WHERE doc_id % 19 <> 3),
        cont AS (
          SELECT DISTINCT t.doc_id FROM (
            SELECT doc_id, ('0x' || substr(md5(ng), 1, 15))::BIGINT AS ngh FROM (
              SELECT doc_id, UNNEST(list_distinct(list_transform(
                range(1, len(toks) - 3),
                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                  || toks[i+3] || ' ' || toks[i+4]))) AS ng
              FROM (SELECT doc_id, string_split(text, ' ') AS toks
                    FROM qual WHERE doc_id % 19 <> 3))) t
          JOIN evn e ON t.ngh = e.ngh),
        clean AS (
          SELECT doc_id, source FROM train
          WHERE doc_id NOT IN (SELECT doc_id FROM cont))
        SELECT doc_id, source FROM clean
        WHERE ('0x' || substr(md5('mix#' || doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0
          < CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5 ELSE 0.3 END
        ORDER BY doc_id""")),

    // ── deterministic global training-order shuffle, written as
    //    (shard, pos) — a uniform permutation without a global sort;
    //    each shard orders independently (one window shuffle). ────────
    Q("p15_curriculum",
      (s, dir) => {
        // integer difficulty grid: floor(quality*100) — floor, not
        // round (rounding half-cases are the one float op engines
        // disagree on); cuts from the q57 sketch, buckets broadcast
        val qs = graft.ops.TextOps
          .qualityColumns(col("text"), Seq("the", "a", "of", "to"))
          .toMap.apply("quality_score")
        SampleOps.curriculumShards(
          Tables.documents(s, dir)
            .withColumn("score_i", floor(qs * 100).cast("long")),
          "doc_id", col("score_i"), nShards = 4, salt = "cur")
          .select(col("bucket"), col("shard"), col("pos").cast("long").as("pos"),
            col("doc_id"), col("score_i"))
          .orderBy("bucket", "shard", "pos")
      },
      Some("""WITH q AS (
          SELECT doc_id,
            CAST(FLOOR(
              ((CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')))
               * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'to'))) AS DOUBLE)
                 / len(string_split(text, ' ')))) * 100) AS BIGINT) AS score_i
          FROM documents),
        census AS (SELECT score_i AS v, COUNT(*) AS cnt FROM q GROUP BY 1),
        n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM census),
        upd AS (SELECT v, cnt, (l::VARCHAR || ':' || (v >> l)::VARCHAR) AS dk
                FROM census CROSS JOIN range(10) t(l)),
        reg AS (SELECT i,
          ('0x' || substr(md5(i::VARCHAR || '|' || dk), 1, 15))::BIGINT
            % 512 AS j,
          CAST(SUM(cnt) AS BIGINT) AS c
          FROM upd CROSS JOIN range(3) u(i) GROUP BY 1, 2),
        cand AS (SELECT x FROM range(1, 1025) c(x)),
        dec AS (SELECT x, (k::VARCHAR || ':' || (2*(x >> (k+1)))::VARCHAR) AS dk
                FROM cand CROSS JOIN range(10) d(k)
                WHERE ((x >> k) & 1) = 1),
        keys AS (SELECT DISTINCT dk FROM dec),
        kp AS (SELECT dk, i,
          ('0x' || substr(md5(i::VARCHAR || '|' || dk), 1, 15))::BIGINT
            % 512 AS j
          FROM keys CROSS JOIN range(3) u(i)),
        est AS (SELECT kp.dk, MIN(COALESCE(r.c, 0)) AS est_n
                FROM kp LEFT JOIN reg r ON r.i = kp.i AND r.j = kp.j
                GROUP BY kp.dk),
        prefix AS (SELECT d.x, CAST(SUM(e.est_n) AS BIGINT) AS est_rank
                   FROM dec d JOIN est e ON e.dk = d.dk GROUP BY d.x),
        phis AS (SELECT phi FROM (VALUES (0.25), (0.5), (0.75)) p(phi)),
        tgt AS (SELECT phi, CAST(CEIL(phi * n.n) AS BIGINT) AS target
                FROM phis CROSS JOIN n),
        cuts AS (SELECT t.phi,
                   MIN(CASE WHEN p.est_rank >= t.target THEN p.x - 1 END)
                     AS q_est
                 FROM tgt t CROSS JOIN prefix p GROUP BY t.phi),
        b AS (SELECT q.doc_id, q.score_i,
                CAST(COUNT(CASE WHEN q.score_i > c.q_est THEN 1 END) AS INT)
                  AS bucket
              FROM q CROSS JOIN cuts c GROUP BY 1, 2),
        h AS (SELECT *,
                ('0x' || substr(md5('cur#' || doc_id::VARCHAR), 1, 15))::BIGINT
                  AS hv
              FROM b)
        SELECT bucket, CAST(hv % 4 AS INT) AS shard,
          CAST(ROW_NUMBER() OVER
            (PARTITION BY bucket, hv % 4 ORDER BY hv, doc_id) AS BIGINT) AS pos,
          doc_id, score_i
        FROM h ORDER BY bucket, shard, pos""")),

    Q("p08_shuffle_shards",
      (s, dir) => SampleOps.shuffleShards(Tables.documents(s, dir),
        "doc_id", nShards = 8, salt = "ord")
        .select(col("shard"), col("pos").cast("long").as("pos"), col("doc_id"))
        .orderBy("shard", "pos"),
      Some("""WITH h AS (
          SELECT doc_id,
            ('0x' || substr(md5('ord#' || doc_id::VARCHAR), 1, 15))::BIGINT AS hv
          FROM documents)
        SELECT CAST(hv % 8 AS INT) AS shard,
          CAST(ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id)
            AS BIGINT) AS pos,
          doc_id
        FROM h ORDER BY shard, pos""")),

    // ── EXACTLY-k sample: bottom k by salted hash — the deterministic
    //    reservoir analog (p01 gives a fraction, never a count);
    //    TakeOrderedAndProject, k rows per partition, no global sort
    //    (plan-asserted in SampleOpsSpec). ─────────────────────────────
    Q("p17_bottomk_sample",
      (s, dir) => SampleOps.bottomKSample(
        Tables.documents(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", k = 50)
        .orderBy("doc_id"),
      Some("""WITH u AS (
          SELECT doc_id, lang,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS sample_uh
          FROM documents),
        s AS (SELECT * FROM u ORDER BY sample_uh, doc_id LIMIT 50)
        SELECT doc_id, lang, sample_uh FROM s ORDER BY doc_id""")),

    // ── p18: duplicate frequency capping (SlimPajama recipe) — keep
    //    at most `cap` copies per exact content key, ranked by doc_id
    //    so the kept set is deterministic and append-stable ───────────
    Q("p18_frequency_cap",
      (s, dir) => SampleOps.frequencyCap(
        Tables.documents(s, dir).select(col("doc_id"), col("text")),
        md5(col("text")), "doc_id", cap = 2)
        .select("doc_id", "content_key", "copy_rank", "kept")
        .orderBy("doc_id"),
      Some("""WITH t AS (
          SELECT doc_id, md5(text) AS content_key FROM documents),
        r AS (
          SELECT doc_id, content_key,
            CAST(ROW_NUMBER() OVER (
              PARTITION BY content_key ORDER BY doc_id) AS BIGINT)
              AS copy_rank
          FROM t)
        SELECT doc_id, content_key, copy_rank,
          copy_rank <= 2 AS kept
        FROM r ORDER BY doc_id""")),

    // ── p19: ε-DP Laplace count release — privacy-budgeted corpus
    //    composition stats (per-source doc counts) with the noise
    //    draw derived from the salted key hash, so the release is
    //    deterministic and the oracle replays it bit-for-bit ───────────
    Q("p19_dp_counts",
      (s, dir) => SampleOps.dpNoisedCounts(
        Tables.documents(s, dir), "source", epsilon = 1.0, salt = "demo")
        .orderBy("source"),
      Some("""WITH c AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_true
          FROM documents GROUP BY source),
        u AS (
          SELECT source, n_true,
            ('0x' || substr(md5('demo' || '#' || source), 1, 15))::BIGINT
              / 1152921504606846976.0 AS u
          FROM c)
        SELECT source, n_true,
          n_true + ROUND(-1.0 * CASE WHEN u - 0.5 > 0 THEN 1.0
              WHEN u - 0.5 < 0 THEN -1.0 ELSE 0.0 END
            * ln(GREATEST(1e-12, 1.0 - 2.0 * ABS(u - 0.5))), 6)
            AS n_released
        FROM u ORDER BY source""")),

    // ── p21: quantile normalization — map the t02 quality grid score
    //    onto its approximate quantile rank via sketch cuts (p15's
    //    machinery as a FEATURE transform): rank-normalize 100 TB
    //    without a global sort ─────────────────────────────────────────
    Q("p21_quantile_normalize",
      (s, dir) => {
        val qs = graft.ops.TextOps
          .qualityColumns(col("text"), Seq("the", "a", "of", "to"))
          .toMap.apply("quality_score")
        SampleOps.quantileNormalize(
          Tables.documents(s, dir)
            .select(col("doc_id"),
              floor(qs * 100).cast("long").as("score_i")),
          col("score_i"), nBuckets = 4)
          .orderBy("doc_id")
      },
      Some("""WITH q AS (
          SELECT doc_id,
            CAST(FLOOR(
              ((CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                 / len(string_split(text, ' ')))
               * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                   t -> t IN ('the', 'a', 'of', 'to'))) AS DOUBLE)
                 / len(string_split(text, ' ')))) * 100) AS BIGINT) AS score_i
          FROM documents),
        census AS (SELECT score_i AS v, COUNT(*) AS cnt FROM q GROUP BY 1),
        n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM census),
        upd AS (SELECT v, cnt, (l::VARCHAR || ':' || (v >> l)::VARCHAR) AS dk
                FROM census CROSS JOIN range(10) t(l)),
        reg AS (SELECT i,
          ('0x' || substr(md5(i::VARCHAR || '|' || dk), 1, 15))::BIGINT
            % 512 AS j,
          CAST(SUM(cnt) AS BIGINT) AS c
          FROM upd CROSS JOIN range(3) u(i) GROUP BY 1, 2),
        cand AS (SELECT x FROM range(1, 1025) c(x)),
        dec AS (SELECT x, (k::VARCHAR || ':' || (2*(x >> (k+1)))::VARCHAR) AS dk
                FROM cand CROSS JOIN range(10) d(k)
                WHERE ((x >> k) & 1) = 1),
        keys AS (SELECT DISTINCT dk FROM dec),
        kp AS (SELECT dk, i,
          ('0x' || substr(md5(i::VARCHAR || '|' || dk), 1, 15))::BIGINT
            % 512 AS j
          FROM keys CROSS JOIN range(3) u(i)),
        est AS (SELECT kp.dk, MIN(COALESCE(r.c, 0)) AS est_n
                FROM kp LEFT JOIN reg r ON r.i = kp.i AND r.j = kp.j
                GROUP BY kp.dk),
        prefix AS (SELECT d.x, CAST(SUM(e.est_n) AS BIGINT) AS est_rank
                   FROM dec d JOIN est e ON e.dk = d.dk GROUP BY d.x),
        phis AS (SELECT phi FROM (VALUES (0.25), (0.5), (0.75)) p(phi)),
        tgt AS (SELECT phi, CAST(CEIL(phi * n.n) AS BIGINT) AS target
                FROM phis CROSS JOIN n),
        cuts AS (SELECT t.phi,
                   MIN(CASE WHEN p.est_rank >= t.target THEN p.x - 1 END)
                     AS q_est
                 FROM tgt t CROSS JOIN prefix p GROUP BY t.phi)
        SELECT q.doc_id, q.score_i,
          CAST(COUNT(CASE WHEN q.score_i > c.q_est THEN 1 END) AS DOUBLE)
            / 4 AS q_norm
        FROM q CROSS JOIN cuts c GROUP BY 1, 2
        ORDER BY q.doc_id""")),

    // ── p20: quota sampling — per-group exact-k targets (balanced
    //    eval-set construction): bottom-k by salted hash within each
    //    group, target from the quota map (p03's determinism with a
    //    target per group) ─────────────────────────────────────────────
    Q("p20_quota_sample",
      (s, dir) => SampleOps.quotaSample(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "source", "doc_id",
        quotas = Map("src0" -> 10, "src1" -> 3, "src2" -> 0),
        defaultQuota = 5, salt = "quota")
        .orderBy("doc_id"),
      Some("""WITH u AS (
          SELECT doc_id, source,
            ('0x' || substr(md5('quota' || '#' || doc_id::VARCHAR), 1, 15))::BIGINT
              AS hv
          FROM documents),
        r AS (
          SELECT doc_id, source,
            ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY hv, doc_id) AS rk
          FROM u)
        SELECT doc_id, source FROM r
        WHERE rk <= CASE source WHEN 'src0' THEN 10 WHEN 'src1' THEN 3
          WHEN 'src2' THEN 0 ELSE 5 END
        ORDER BY doc_id""")),

    // ── p22: stratified EXACT-proportion split — per-lang 6/1/1
    //    train/val/test with boundaries cut at floor(n·cum_frac), so
    //    every stratum hits the target composition exactly (p01 is
    //    only proportional in expectation). Cut fractions 0.75 / 0.875
    //    are exact binary doubles: floor() cannot straddle engines ─────
    Q("p22_stratified_split",
      (s, dir) => SampleOps.stratifiedExactSplit(Tables.documents(s, dir),
        "lang", "doc_id", Seq("train" -> 6.0, "val" -> 1.0, "test" -> 1.0))
        .select("doc_id", "lang", "split")
        .orderBy("doc_id"),
      Some("""WITH u AS (
          SELECT doc_id, lang,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM documents),
        r AS (
          SELECT doc_id, lang,
            ROW_NUMBER() OVER (PARTITION BY lang ORDER BY uh, doc_id) AS rk,
            COUNT(*) OVER (PARTITION BY lang) AS n
          FROM u)
        SELECT doc_id, lang,
          CASE WHEN rk <= FLOOR(n * 0.75e0) THEN 'train'
               WHEN rk <= FLOOR(n * 0.875e0) THEN 'val'
               ELSE 'test' END AS split
        FROM r ORDER BY doc_id""")),

    // ── p23: epoch-budget plan — the data-constrained allocation
    //    table (want = budget·weight; epochs capped at 4; deficit =
    //    what repetition can't fill). Double weight literals (e0) in
    //    the oracle pin bit-identical arithmetic ───────────────────────
    Q("p23_epoch_plan",
      (s, dir) => SampleOps.epochBudgetPlan(
        Tables.documents(s, dir)
          .withColumn("n_toks", graft.ops.TextOps.tokenCount(col("text"))),
        "source", col("n_toks"),
        weights = Seq("src0" -> 5.0, "src1" -> 3.0, "src2" -> 2.0),
        budget = 20000.0, maxEpochs = 4.0)
        .orderBy("source"),
      Some("""WITH per AS (
          SELECT source,
            CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens
          FROM documents GROUP BY source),
        m AS (
          SELECT source, n_tokens,
            CASE source WHEN 'src0' THEN 0.5e0 WHEN 'src1' THEN 0.3e0
              WHEN 'src2' THEN 0.2e0 ELSE 0.0e0 END AS w
          FROM per),
        c AS (
          SELECT source, n_tokens, w,
            20000.0e0 * w AS want,
            LEAST(20000.0e0 * w / n_tokens, 4.0e0) AS epochs,
            LEAST(20000.0e0 * w, n_tokens * 4.0e0) AS usable
          FROM m)
        SELECT source, n_tokens,
          ROUND(w, 6) AS target_weight,
          ROUND(want, 6) AS tokens_wanted,
          ROUND(epochs, 6) AS epochs,
          ROUND(usable, 6) AS tokens_usable,
          ROUND(want - usable, 6) AS deficit
        FROM c ORDER BY source""")),

    // ── p24: epoch-plan materialization — p23's table turned into
    //    actual training rows: ⌊e⌋ full copies per doc + a fractional
    //    hash-kept copy, so each group's expected volume equals its
    //    planned epochs exactly. Plan broadcasts; the explode is a
    //    narrow scan; assignment is append-stable ───────────────────────
    Q("p24_epoch_materialize",
      (s, dir) => SampleOps.materializeEpochPlan(
        Tables.documents(s, dir)
          .withColumn("n_toks", graft.ops.TextOps.tokenCount(col("text"))),
        "source", "doc_id", col("n_toks"),
        weights = Seq("src0" -> 5.0, "src1" -> 3.0, "src2" -> 2.0),
        budget = 20000.0, maxEpochs = 4.0)
        .orderBy("doc_id", "copy_idx"),
      Some("""WITH per AS (
          SELECT source,
            CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens
          FROM documents GROUP BY source),
        m AS (
          SELECT source, n_tokens,
            CASE source WHEN 'src0' THEN 0.5e0 WHEN 'src1' THEN 0.3e0
              WHEN 'src2' THEN 0.2e0 ELSE 0.0e0 END AS w
          FROM per),
        c AS (
          SELECT source,
            ROUND(LEAST(20000.0e0 * w / n_tokens, 4.0e0), 6) AS epochs
          FROM m),
        j AS (
          SELECT d.doc_id, d.source, c.epochs,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM documents d JOIN c USING (source)),
        fullr AS (
          SELECT doc_id, source,
            UNNEST(range(0, CAST(FLOOR(epochs) AS INT))) AS copy_idx
          FROM j),
        fracr AS (
          SELECT doc_id, source, CAST(FLOOR(epochs) AS INT) AS copy_idx
          FROM j WHERE uh < epochs - FLOOR(epochs))
        SELECT doc_id, source, copy_idx FROM fullr
        UNION ALL
        SELECT doc_id, source, copy_idx FROM fracr
        ORDER BY doc_id, copy_idx""")),

    // ── p25: split-leakage audit — for each held-out split of p01's
    //    hash split, how many of its distinct 8-grams also appear in
    //    TRAIN (the d11 decontamination lens turned on the split
    //    itself: document-level splits still leak via shared spans).
    //    Grams collapse to 8-byte hashes before any join ────────────────
    Q("p25_split_leak_audit",
      (s, dir) => {
        val docs = SampleOps.hashSplit(Tables.documents(s, dir), "doc_id",
          Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
        val grams = docs.select(col("split"),
          explode(graft.functions.PortableSketches.ngramHashes60(
            col("text"), 8)).as("g"))
        val trainG = grams.where(col("split") === "train")
          .select("g").distinct()
        val held = grams.where(col("split") =!= "train").distinct()
        val leaked = held.join(trainG, Seq("g"), "left_semi")
          .groupBy("split").agg(count(lit(1)).as("n_leaked_grams"))
        held.groupBy("split").agg(count(lit(1)).as("n_grams"))
          .join(leaked, Seq("split"), "left")
          .select(col("split"), col("n_grams"),
            coalesce(col("n_leaked_grams"), lit(0L)).as("n_leaked_grams"),
            round(coalesce(col("n_leaked_grams"), lit(0L)).cast("double")
              / col("n_grams"), 6).as("leak_rate"))
          .orderBy("split")
      },
      Some("""WITH u AS (
          SELECT doc_id, text,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM documents),
        sp AS (
          SELECT doc_id, text,
            CASE WHEN uh < 8.0/10 THEN 'train'
                 WHEN uh < 8.0/10 + 1.0/10 THEN 'val'
                 ELSE 'test' END AS split
          FROM u),
        ts AS (SELECT split, string_split(text, ' ') AS toks FROM sp),
        gr AS (
          SELECT split, ('0x' || substr(md5(ng), 1, 15))::BIGINT AS g
          FROM (
            SELECT split, UNNEST(list_transform(
              range(1, len(toks) - 6),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' '
                || toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' '
                || toks[i+6] || ' ' || toks[i+7])) AS ng
            FROM ts)),
        tg AS (SELECT DISTINCT g FROM gr WHERE split = 'train'),
        held AS (SELECT DISTINCT split, g FROM gr WHERE split <> 'train'),
        lk AS (
          SELECT split, CAST(COUNT(*) AS BIGINT) AS n_leaked_grams
          FROM held WHERE g IN (SELECT g FROM tg) GROUP BY split),
        tot AS (
          SELECT split, CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM held GROUP BY split)
        SELECT t.split, n_grams,
          COALESCE(n_leaked_grams, 0) AS n_leaked_grams,
          ROUND(CAST(COALESCE(n_leaked_grams, 0) AS DOUBLE) / n_grams, 6)
            AS leak_rate
        FROM tot t LEFT JOIN lk ON lk.split = t.split
        ORDER BY t.split""")),

    // ── p26: cluster-balanced sampling — keep probability 1/|cluster|
    //    over d06's near-dup clusters, so CONTENT is sampled uniformly
    //    instead of copies (dedup-by-downsampling: the soft alternative
    //    to dropping that preserves natural duplication signal in
    //    expectation-one form). Hash predicate stays narrow; the only
    //    heavy stage is the cluster labeling it composes ────────────────
    Q("p26_cluster_balanced_sample",
      (s, dir) => {
        val clusters = graft.ops.TextOps.dedupClustersMinHash(
          Tables.documents(s, dir), "doc_id", "text",
          numHashes = 16, bands = 2, minEstimate = 0.7, portable = true)
        clusters.where(
            SampleOps.unitHash(col("doc_id"), "cb")
              * col("cluster_size") < 1.0)
          .select("doc_id", "cluster_id", "cluster_size")
          .orderBy("doc_id")
      },
      Some(TextQueries.minhashClusterSql + """,
        sel AS (
          SELECT l.doc_id, l.cluster_id, s.cluster_size
          FROM lab l JOIN sz s USING (cluster_id))
        SELECT doc_id, cluster_id, cluster_size FROM sel
        WHERE (('0x' || substr(md5('cb' || '#' || doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0) * cluster_size < 1.0
        ORDER BY doc_id""")),

    // ── p27: split drift (PSI) — Population Stability Index of the
    //    doc-length distribution between TRAIN and each held-out split
    //    (the standard ML monitoring score; > 0.2 flags drift). Ten
    //    equal-width buckets off a 1-row min/max scalar, Laplace-
    //    smoothed shares, and the PSI fold runs bucket-ordered (the
    //    q95 lesson: unordered double sums can flip the 6-dp snap) ──────
    Q("p27_split_psi",
      (s, dir) => {
        val docs = SampleOps.hashSplit(Tables.documents(s, dir), "doc_id",
            Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
          .select(col("split"), col("n_chars").cast("double").as("x"))
        val mm = docs.agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
        // min==max degenerate guard: width 1 → everything in bucket 0
        // (mirrored by the oracle's CASE), instead of floor(0/0)=NaN
        val width = when(col("hi") === col("lo"), lit(1.0))
          .otherwise((col("hi") - col("lo")) / lit(10.0))
        val bucket = least(floor((col("x") - col("lo")) / width), lit(9.0))
          .cast("int")
        val counts = docs.crossJoin(broadcast(mm))
          .select(col("split"), bucket.as("bucket"))
          .groupBy("split", "bucket").agg(count(lit(1)).as("n"))
        val totals = counts.groupBy("split").agg(sum(col("n")).as("nt"))
        val sh = counts.join(broadcast(totals), Seq("split"))
          .select(col("split"), col("bucket"),
            ((col("n") + 1).cast("double") / (col("nt") + 10))
              .as("share")) // Laplace: every bucket strictly positive
        // inner join on bucket: a bucket absent from either side
        // contributes no term (both engines apply the same convention;
        // at these corpus sizes every bucket is populated)
        val train = sh.where(col("split") === "train")
          .select(col("bucket"), col("share").as("p_train"))
        val held = sh.where(col("split") =!= "train")
        held.join(train, Seq("bucket"))
          .select(col("split"), col("bucket"),
            ((col("share") - col("p_train"))
              * log(col("share") / col("p_train"))).as("term"))
          .groupBy("split")
          .agg(round(aggregate(transform(
            sort_array(collect_list(struct(col("bucket"), col("term")))),
            t => t.getField("term")), lit(0.0), (a, x) => a + x), 6)
            .as("psi"))
          .orderBy("split")
      },
      Some("""WITH u AS (
          SELECT doc_id, CAST(n_chars AS DOUBLE) AS x,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM documents),
        sp AS (
          SELECT x,
            CASE WHEN uh < 8.0/10 THEN 'train'
                 WHEN uh < 8.0/10 + 1.0/10 THEN 'val'
                 ELSE 'test' END AS split
          FROM u),
        mm AS (
          SELECT lo, hi,
            CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 10.0 END AS width
          FROM (SELECT MIN(x) AS lo, MAX(x) AS hi FROM sp)),
        b AS (
          SELECT split,
            CAST(LEAST(FLOOR((x - lo) / width), 9.0) AS INT)
              AS bucket
          FROM sp CROSS JOIN mm),
        c AS (SELECT split, bucket, CAST(COUNT(*) AS BIGINT) AS n
              FROM b GROUP BY 1, 2),
        t AS (SELECT split, CAST(SUM(n) AS BIGINT) AS nt
              FROM c GROUP BY split),
        sh AS (
          SELECT c.split, c.bucket,
            CAST(c.n + 1 AS DOUBLE) / (t.nt + 10) AS share
          FROM c JOIN t ON t.split = c.split),
        tr AS (SELECT bucket, share AS p_train FROM sh
               WHERE split = 'train'),
        terms AS (
          SELECT sh.split, sh.bucket,
            (sh.share - tr.p_train) * ln(sh.share / tr.p_train) AS term
          FROM sh JOIN tr ON tr.bucket = sh.bucket
          WHERE sh.split <> 'train')
        SELECT split,
          ROUND(list_sum(list(term ORDER BY bucket)), 6) AS psi
        FROM terms GROUP BY split ORDER BY split""")),

    // ── p28: water-filling token quota — 60% of total supply split
    //    across sources at the common water level λ (max-min
    //    fairness): small sources keep everything, mega-sources cap
    //    at λ. Closed-form over the sorted per-source supply census —
    //    one partial agg + a coordinator-scale sort window over
    //    one-row-per-source, integer math until the final division ──────
    Q("p28_token_waterfill",
      (s, dir) => {
        val sup = Tables.documents(s, dir)
          .groupBy("source")
          .agg(sum(graft.ops.TextOps.tokenCount(col("text")))
            .as("n_tokens"))
        SampleOps.waterfillQuota(sup, "source", "n_tokens",
          budgetPct = 60)
          .withColumnRenamed("supply", "n_tokens")
          .orderBy("source")
      },
      Some("""WITH sup AS (
          SELECT source,
            CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS supply
          FROM documents GROUP BY source),
        t AS (
          SELECT CAST(SUM(supply) AS BIGINT) AS total,
            CAST(COUNT(*) AS BIGINT) AS n
          FROM sup),
        r AS (
          SELECT source, supply, n,
            CAST(total * 60 // 100 AS BIGINT) AS b,
            CAST(ROW_NUMBER() OVER (ORDER BY supply, source) AS BIGINT)
              AS k,
            SUM(supply) OVER (ORDER BY supply, source
              ROWS UNBOUNDED PRECEDING) AS prefix
          FROM sup CROSS JOIN t),
        f AS (
          SELECT *, prefix + (n - k) * supply <= b AS feasible FROM r),
        c AS (
          SELECT COALESCE(MAX(CASE WHEN feasible THEN k END), 0)
              AS kstar,
            COALESCE(MAX(CASE WHEN feasible THEN prefix END), 0)
              AS pstar
          FROM f),
        lv AS (
          SELECT f.*, c.kstar,
            CAST(f.b - c.pstar AS DOUBLE)
              / CAST(f.n - c.kstar AS DOUBLE) AS level
          FROM f CROSS JOIN c)
        SELECT source, supply AS n_tokens,
          CASE WHEN kstar = n THEN CAST(supply AS DOUBLE)
            ELSE ROUND(LEAST(CAST(supply AS DOUBLE), level), 6) END
            AS allocation,
          (k > kstar AND kstar <> n) AS capped,
          CASE WHEN kstar = n THEN NULL
            ELSE ROUND(level, 6) END AS level
        FROM lv ORDER BY source""")),

    // ── p29: exponentiated-gradient mixture reweighting — the DoReMi
    //    weight-update step (Xie et al. 2023, arXiv:2305.10429 Alg. 1)
    //    with the per-source quality DEFICIT standing in for excess
    //    loss: w ← normalize(w · exp(ℓ)), 3 unrolled rounds. Every
    //    round snaps to 6 dp and the normalizer folds source-ordered
    //    (the p27 determinism rule), so the oracle replays the whole
    //    iteration. Source-many rows end to end — coordinator-scale
    //    after the one quality rollup ───────────────────────────────────
    Q("p29_mixture_eg",
      (s, dir) => {
        val qs = graft.ops.TextOps
          .qualityColumns(col("text"), Seq("the", "a", "of", "to"))
          .toMap.apply("quality_score")
        val mq = Tables.documents(s, dir)
          .groupBy("source").agg(round(avg(qs), 6).as("mq"))
        val mx = mq.agg(max(col("mq")).as("mqmax"),
          count(lit(1)).as("n_src"))
        var w = mq.crossJoin(broadcast(mx))
          .select(col("source"),
            round(col("mqmax") - col("mq"), 6).as("excess_loss"),
            round(lit(1.0) / col("n_src"), 6).as("w0"))
        for (t <- 1 to 3) {
          val u = w.withColumn(s"__u$t",
            round(col(s"w${t - 1}") * exp(col("excess_loss")), 6))
          val tot = u.agg(aggregate(transform(
            sort_array(collect_list(struct(col("source"),
              col(s"__u$t").as("u")))),
            x => x.getField("u")), lit(0.0), (a, b) => a + b).as("__tot"))
          w = u.crossJoin(broadcast(tot))
            .withColumn(s"w$t",
              round(col(s"__u$t") / col("__tot"), 6))
            .drop(s"__u$t", "__tot")
        }
        w.select("source", "excess_loss", "w0", "w1", "w2", "w3")
          .orderBy("source")
      },
      Some("""WITH q AS (
          SELECT source,
            (CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
              / len(string_split(text, ' ')))
            * (1.0 - CAST(len(list_filter(string_split(text, ' '),
                t -> t IN ('the', 'a', 'of', 'to'))) AS DOUBLE)
              / len(string_split(text, ' '))) AS qs
          FROM documents),
        mq AS (SELECT source, ROUND(AVG(qs), 6) AS mq FROM q GROUP BY 1),
        mx AS (SELECT MAX(mq) AS mqmax,
          CAST(COUNT(*) AS BIGINT) AS n_src FROM mq),
        r0 AS (
          SELECT source, ROUND(mqmax - mq, 6) AS excess_loss,
            ROUND(1.0 / n_src, 6) AS w0
          FROM mq CROSS JOIN mx),
        u1 AS (SELECT *, ROUND(w0 * EXP(excess_loss), 6) AS u FROM r0),
        t1 AS (SELECT list_sum(list(u ORDER BY source)) AS tot FROM u1),
        r1 AS (SELECT source, excess_loss, w0, ROUND(u / tot, 6) AS w1
               FROM u1 CROSS JOIN t1),
        u2 AS (SELECT *, ROUND(w1 * EXP(excess_loss), 6) AS u FROM r1),
        t2 AS (SELECT list_sum(list(u ORDER BY source)) AS tot FROM u2),
        r2 AS (SELECT source, excess_loss, w0, w1,
                 ROUND(u / tot, 6) AS w2
               FROM u2 CROSS JOIN t2),
        u3 AS (SELECT *, ROUND(w2 * EXP(excess_loss), 6) AS u FROM r2),
        t3 AS (SELECT list_sum(list(u ORDER BY source)) AS tot FROM u3),
        r3 AS (SELECT source, excess_loss, w0, w1, w2,
                 ROUND(u / tot, 6) AS w3
               FROM u3 CROSS JOIN t3)
        SELECT source, excess_loss, w0, w1, w2, w3
        FROM r3 ORDER BY source""")),

    // ── p31: class weights — the imbalanced-training table: inverse-
    //    frequency weight per label, w_c = N / (K·n_c) (sklearn's
    //    "balanced" heuristic), plus the sampling probability that
    //    equalizes classes. Exact-integer threshold compare; one
    //    label census + a 1-row (N, K) scalar ───────────────────────────
    Q("p31_class_weights",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val census = e.groupBy("label").agg(count(lit(1)).as("n_label"))
        val tot = census.agg(sum(col("n_label")).as("n_total"),
          count(lit(1)).as("k_classes"),
          min(col("n_label")).as("n_min"))
        census.crossJoin(broadcast(tot))
          .select(col("label"), col("n_label"), col("n_total"),
            round(col("n_total").cast("double")
              / (col("k_classes") * col("n_label")), 6).as("weight"),
            round(col("n_min").cast("double") / col("n_label"), 6)
              .as("keep_prob"))
          .orderBy("label")
      },
      Some("""WITH c AS (
          SELECT label, CAST(COUNT(*) AS BIGINT) AS n_label
          FROM embeddings GROUP BY 1),
        t AS (SELECT CAST(SUM(n_label) AS BIGINT) AS n_total,
            CAST(COUNT(*) AS BIGINT) AS k_classes,
            CAST(MIN(n_label) AS BIGINT) AS n_min
          FROM c)
        SELECT label, n_label, n_total,
          ROUND(CAST(n_total AS DOUBLE) / (k_classes * n_label), 6)
            AS weight,
          ROUND(CAST(n_min AS DOUBLE) / n_label, 6) AS keep_prob
        FROM c CROSS JOIN t ORDER BY label""")),

    // ── p30: shuffle-quality audit — the QA card for p08's shard
    //    assignment: per shard, the source-mix entropy and the χ²
    //    statistic against the corpus-wide source shares (a bad
    //    shuffle shows low entropy / high χ² — ordered training would
    //    see sources in runs). Terms fold shard-and-source-ordered
    //    (the q95 lesson); only observed (shard, source) cells
    //    contribute, same convention as p27's inner join ────────────────
    Q("p30_shuffle_quality_audit",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sh = SampleOps.shuffleShards(docs, "doc_id", nShards = 8,
            salt = "ord")
          .select(col("shard"), col("doc_id"))
        val cells = sh
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy("shard", "source").agg(count(lit(1)).as("n"))
        val perShard = cells.groupBy("shard")
          .agg(sum(col("n")).as("n_docs"),
            count(lit(1)).as("n_sources"))
        val globalSrc = docs.groupBy("source").agg(count(lit(1)).as("g"))
        val tot = docs.agg(count(lit(1)).as("nt"))
        val terms = cells
          .join(perShard, Seq("shard"))
          .join(broadcast(globalSrc), Seq("source"))
          .crossJoin(broadcast(tot))
          .select(col("shard"), col("source"), col("n_docs"),
            col("n_sources"),
            (col("n").cast("double") / col("n_docs")).as("p"),
            (col("n_docs").cast("double") * col("g") / col("nt"))
              .as("expd"), col("n"))
        terms
          .select(col("shard"), col("source"), col("n_docs"),
            col("n_sources"),
            (-col("p") * log(col("p"))).as("ent_term"),
            ((col("n") - col("expd")) * (col("n") - col("expd"))
              / col("expd")).as("chi_term"))
          .groupBy("shard")
          .agg(max(col("n_docs")).as("n_docs"),
            max(col("n_sources")).as("n_sources"),
            round(aggregate(transform(
              sort_array(collect_list(struct(col("source"),
                col("ent_term")))), t => t.getField("ent_term")),
              lit(0.0), (a, x) => a + x) / math.log(2.0), 6)
              .as("entropy_bits"),
            round(aggregate(transform(
              sort_array(collect_list(struct(col("source"),
                col("chi_term")))), t => t.getField("chi_term")),
              lit(0.0), (a, x) => a + x), 6).as("chi2"))
          .orderBy("shard")
      },
      Some("""WITH h AS (
          SELECT doc_id, source,
            CAST(('0x' || substr(md5('ord#' || doc_id::VARCHAR), 1, 15))::BIGINT
              % 8 AS INT) AS shard
          FROM documents),
        cells AS (
          SELECT shard, source, CAST(COUNT(*) AS BIGINT) AS n
          FROM h GROUP BY 1, 2),
        per_shard AS (
          SELECT shard, CAST(SUM(n) AS BIGINT) AS n_docs,
            CAST(COUNT(*) AS BIGINT) AS n_sources
          FROM cells GROUP BY 1),
        gsrc AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS g
                 FROM documents GROUP BY 1),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM documents),
        terms AS (
          SELECT c.shard, c.source, ps.n_docs, ps.n_sources,
            -(CAST(c.n AS DOUBLE) / ps.n_docs)
              * LN(CAST(c.n AS DOUBLE) / ps.n_docs) AS ent_term,
            (c.n - CAST(ps.n_docs AS DOUBLE) * gs.g / t.nt)
              * (c.n - CAST(ps.n_docs AS DOUBLE) * gs.g / t.nt)
              / (CAST(ps.n_docs AS DOUBLE) * gs.g / t.nt) AS chi_term
          FROM cells c
          JOIN per_shard ps ON ps.shard = c.shard
          JOIN gsrc gs ON gs.source = c.source
          CROSS JOIN tot t)
        SELECT shard, MAX(n_docs) AS n_docs, MAX(n_sources) AS n_sources,
          ROUND(list_sum(list(ent_term ORDER BY source)) / LN(2), 6)
            AS entropy_bits,
          ROUND(list_sum(list(chi_term ORDER BY source)), 6) AS chi2
        FROM terms GROUP BY shard ORDER BY shard""")),

    // ── p32: the COMPOSED training-loader chain (r17 verdict item 3)
    //    — what a pretraining pipeline actually ships, end to end in
    //    ONE oracle-checked entry: epoch-budget plan → materialized
    //    copies (p24's kernel) → deterministic portable shuffle
    //    (hash of doc:copy, ranks via PrefixSum) → per-source WDS
    //    packing into REAL ustar shards (m21's kernel, shuffled
    //    order) → loader walk at sample grain (m22) joined with the
    //    `.cls` member EXTRACTED from the physical tar bytes (m23's
    //    kernel) carrying each sample's provenance. The oracle
    //    replays the entire chain, so it checks all three contract
    //    dimensions at once: the sample COUNT is the epoch plan's
    //    (every (doc, copy) exactly once — coverage), the shard cut
    //    reproduces the cumulative byte budget, and the extracted
    //    provenance must round-trip through real tar member bytes —
    //    one wrong copy, position, offset, or padding byte anywhere
    //    breaks the hash. The shuffle rank orders by the RAW 60-bit
    //    hash (not its double image) so Spark and DuckDB sort
    //    identical keys. Reference parity: faust's agent-chained
    //    topics (streams.py:405-454 through-chains) ─────────────────────
    Q("p32_epoch_to_wds",
      (s, dir) => graft.ops.TarOps.epochToWdsSamples(
        Tables.documents(s, dir).select("source", "doc_id", "text"),
        weights = Seq("src0" -> 5.0, "src1" -> 3.0, "src2" -> 2.0),
        budget = 20000.0, maxEpochs = 4.0, byteBudget = 4096L)
        .orderBy("source", "shard_id", "pos"),
      Some("""WITH per AS (
          SELECT source,
            CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS n_tokens
          FROM documents GROUP BY source),
        m AS (
          SELECT source, n_tokens,
            CASE source WHEN 'src0' THEN 0.5e0 WHEN 'src1' THEN 0.3e0
              WHEN 'src2' THEN 0.2e0 ELSE 0.0e0 END AS w
          FROM per),
        c AS (
          SELECT source,
            ROUND(LEAST(20000.0e0 * w / n_tokens, 4.0e0), 6) AS epochs
          FROM m),
        j AS (
          SELECT d.doc_id, d.source, d.text, c.epochs,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM documents d JOIN c USING (source)),
        fullr AS (
          SELECT doc_id, source, text,
            UNNEST(range(0, CAST(FLOOR(epochs) AS INT))) AS copy_idx
          FROM j),
        fracr AS (
          SELECT doc_id, source, text,
            CAST(FLOOR(epochs) AS INT) AS copy_idx
          FROM j WHERE uh < epochs - FLOOR(epochs)),
        ep AS (
          SELECT doc_id, source, text, copy_idx FROM fullr
          UNION ALL
          SELECT doc_id, source, text, copy_idx FROM fracr),
        k AS (
          SELECT doc_id, source, text,
            doc_id::VARCHAR || ':' || copy_idx::VARCHAR AS ck, copy_idx
          FROM ep),
        h AS (
          SELECT *,
            ('0x' || substr(md5('#' || ck), 1, 15))::BIGINT AS uhl
          FROM k),
        r AS (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY uhl, doc_id, copy_idx) AS BIGINT) AS pos
          FROM h),
        sz AS (
          SELECT source, pos, doc_id, copy_idx,
            strlen(COALESCE(text, '')) + strlen(ck) AS sb
          FROM r),
        cc AS (
          SELECT *, COALESCE(SUM(sb) OVER (PARTITION BY source
            ORDER BY pos
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          FROM sz)
        SELECT source, CAST(cum // 4096 AS BIGINT) AS shard_id, pos,
          doc_id, CAST(copy_idx AS INT) AS copy_idx, 2 AS n_files,
          'cls,txt' AS exts, CAST(sb AS BIGINT) AS sample_bytes
        FROM cc ORDER BY source, shard_id, pos""")),

    // ── p33: the COMPOSED curation pipeline — the corpus cleanup a
    //    pretraining job runs BEFORE p32's loader chain, as one
    //    oracle-checked entry (Gopher/C4 lineage): doc-level quality
    //    gates (t30's kernel, overall `keep` flag) → TOKEN-SET
    //    fingerprint dedup keep-first (the Jaccard-1.0 exact tier of
    //    the d02 family: md5 of the sorted distinct token set — the
    //    fixture corpus has no byte-exact dups but 10%+ token-set
    //    dups, so this stage is live) → leak-stable 8/1/1 hash split
    //    (p01's cuts). C4's LINE rules (t28) are deliberately not in
    //    this chain: the fixture corpus is single-line without
    //    sentence punctuation, so the line gate zeroes it — the
    //    stage exists standalone as t28. Output at doc grain
    //    (id, token count, split): the hash breaks if any gate
    //    predicate, the dedup keep rule, or a split cut drifts.
    //    Every stage is a narrow projection or a fingerprint-key
    //    shuffle — nothing widens at 100 TB ─────────────────────────────
    Q("p33_curation_pipeline",
      (s, dir) => {
        import graft.ops.TextOps
        val docs = Tables.documents(s, dir).select("doc_id", "text")
        val keepIds = TextOps.gopherQualityGates(docs, "doc_id",
            "text", Seq("the", "a", "of", "to"))
          .where(col("keep") === 1).select(col("id"))
        val gated = docs.join(keepIds,
          docs("doc_id") === keepIds("id"), "left_semi")
        val withFp = gated.withColumn("fp",
          md5(concat_ws(" ",
            array_sort(array_distinct(split(col("text"), " "))))))
        val keepFirst = withFp.groupBy("fp")
          .agg(min(col("doc_id")).as("keep_id"))
        val unique = withFp.join(keepFirst,
          withFp("fp") === keepFirst("fp") &&
            col("doc_id") === col("keep_id"))
        SampleOps.hashSplit(
            unique.select(col("doc_id"), col("text")),
            "doc_id", Seq("train" -> 8.0, "val" -> 1.0, "test" -> 1.0))
          .select(col("doc_id"),
            TextOps.tokenCount(col("text")).as("n_tokens"),
            col("split"))
          .orderBy("doc_id")
      },
      Some("""WITH g AS (
          SELECT doc_id, text,
            len(string_split(text, ' ')) AS nw,
            CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1)
              AS DOUBLE) / len(string_split(text, ' ')) AS ml,
            CAST(len(list_filter(string_split(text, ' '),
              t -> contains(t, '#') OR contains(t, '...'))) AS DOUBLE)
              / len(string_split(text, ' ')) AS sym,
            CAST(len(list_filter(string_split(text, ' '),
              t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE)
              / len(string_split(text, ' ')) AS alpha,
            len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to'))) AS nstop
          FROM documents),
        q AS (
          SELECT doc_id, text FROM g
          WHERE nw BETWEEN 10 AND 100000 AND ml BETWEEN 3.0 AND 10.0
            AND sym <= 0.1 AND alpha >= 0.8 AND nstop >= 2),
        d AS (
          SELECT doc_id, text,
            MD5(array_to_string(list_sort(list_distinct(
              string_split(text, ' '))), ' ')) AS fp
          FROM q),
        m AS (SELECT fp, MIN(doc_id) AS keep_id FROM d GROUP BY fp),
        u AS (SELECT d.doc_id, d.text FROM d
              JOIN m ON d.fp = m.fp AND d.doc_id = m.keep_id),
        sp AS (
          SELECT doc_id, text,
            ('0x' || substr(md5('#' || doc_id::VARCHAR), 1, 15))::BIGINT
              / 1152921504606846976.0 AS uh
          FROM u)
        SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
          CASE WHEN uh < 8.0/10 THEN 'train'
               WHEN uh < 8.0/10 + 1.0/10 THEN 'val'
               ELSE 'test' END AS split
        FROM sp ORDER BY doc_id""")))
}