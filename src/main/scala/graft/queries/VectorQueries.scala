package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.VectorOps

/** Similarity search over the `embeddings` table (`array<float>`). */
object VectorQueries {

  /** Shared k-means CTE chain: 2 unrolled Lloyd rounds over whatever
    * `pivotCtes` (ending in `piv(pid, pvec)`) selects as init centers.
    * 6-dp snapping after each round makes round-2 inputs bit-identical
    * across engines, so the whole iteration is hash-EXACT. Ends open
    * (after `u2(cell, i, c, n)`) so callers append their own tail.
    */
  private def kmeansCtes(pivotCtes: String): String =
    s"""WITH base AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, 65),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
          FROM embeddings),
        $pivotCtes,
        cn0 AS (
          SELECT pid AS cell,
            list_transform(pvec, x -> CAST(x AS DOUBLE)) AS cvec,
            SQRT(list_sum(list_transform(pvec,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cnrm
          FROM piv),
        s1 AS (
          SELECT b.vec_id AS id, c.cell,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * c.cvec[i]))
              / (b.nrm * c.cnrm) AS psim
          FROM base b CROSS JOIN cn0 c),
        a1 AS (
          SELECT id, cell FROM (
            SELECT id, cell, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, cell) AS rk FROM s1)
          WHERE rk = 1),
        u1 AS (
          SELECT a.cell, t.i,
            ROUND(AVG(CAST(b.embedding[t.i] AS DOUBLE)), 6) AS c
          FROM a1 a JOIN base b ON b.vec_id = a.id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY a.cell, t.i),
        cn1 AS (
          SELECT cell, cvec,
            SQRT(list_sum(list_transform(cvec, x -> x * x))) AS cnrm
          FROM (SELECT cell, list(c ORDER BY i) AS cvec FROM u1 GROUP BY cell)),
        s2 AS (
          SELECT b.vec_id AS id, c.cell,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * c.cvec[i]))
              / (b.nrm * c.cnrm) AS psim
          FROM base b CROSS JOIN cn1 c),
        a2 AS (
          SELECT id, cell FROM (
            SELECT id, cell, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, cell) AS rk FROM s2)
          WHERE rk = 1),
        u2 AS (
          SELECT a.cell, t.i,
            ROUND(AVG(CAST(b.embedding[t.i] AS DOUBLE)), 6) AS c,
            COUNT(*) AS n
          FROM a2 a JOIN base b ON b.vec_id = a.id
          CROSS JOIN range(1, 65) t(i)
          GROUP BY a.cell, t.i)"""

  private def kmeansSql(pivotCtes: String): String =
    kmeansCtes(pivotCtes) + "\n        SELECT cell, i, c, n FROM u2 ORDER BY cell, i"

  /** Shared IVF assignment CTE prefix — the portable pivot pick and
    * probes=2 cell assignment every IVF-family oracle starts from
    * (ends after `assigned(id, cell)`). Reused by [[ivfKnnCtes]] and
    * the d28 decontamination oracle.
    */
  private val ivfAssignCtes: String =
    """base AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, 65),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
          FROM embeddings),
        piv AS (
          SELECT vec_id AS pid, embedding AS pvec, nrm AS pnrm
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        sim AS (
          SELECT b.vec_id AS id, p.pid,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE)))
              / (b.nrm * p.pnrm) AS psim
          FROM base b CROSS JOIN piv p),
        assigned AS (
          SELECT id, pid AS cell FROM (
            SELECT id, pid, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, pid) AS prk
            FROM sim)
          WHERE prk <= 2)"""

  /** Shared IVF self-kNN CTE chain — s05's plan replayed (portable
    * pivot pick, probes=2 assignment, intra-cell exact cosine rerank),
    * ending after `ranked(id_a, id_b, cos, rk)`. Reused by the s17
    * recall report, which joins it against the brute-force truth.
    */
  private val ivfKnnCtes: String = ivfAssignCtes +
    """,
        pairs AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id <> b.id),
        scored AS (
          SELECT p.id_a, p.id_b,
            list_sum(list_transform(range(1, 65),
              i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
              / (ea.nrm * eb.nrm) AS cos
          FROM pairs p
          JOIN base ea ON ea.vec_id = p.id_a
          JOIN base eb ON eb.vec_id = p.id_b),
        ranked AS (
          SELECT id_a, id_b, cos,
            ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk
          FROM scored)"""


  /** Shared replay of the s23 power iteration (2 rounds, 6-dp snaps)
    * ending after `fin(v, lambda)` over `e(vec_id, x)` — s23 appends
    * the spectrum summary, s25 the per-vector cleanup.
    */
  private val pcaFinCtes: String =
    """WITH e AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x
          FROM embeddings),
        y1 AS (
          SELECT vec_id, x,
            list_sum(list_transform(x, a -> a * 0.125e0)) AS y
          FROM e),
        s1 AS (
          SELECT t.j, ROUND(SUM(y1.x[t.j] * y1.y), 6) AS s
          FROM y1 CROSS JOIN range(1, 65) t(j) GROUP BY t.j),
        l1 AS (SELECT list(s ORDER BY j) AS sv FROM s1),
        n1 AS (
          SELECT sv, SQRT(list_sum(list_transform(sv, d -> d * d))) AS nrm
          FROM l1),
        vv1 AS (
          SELECT list_transform(sv, d -> ROUND(d / nrm, 6)) AS v FROM n1),
        y2 AS (
          SELECT e.vec_id, e.x,
            list_sum(list_transform(range(1, 65),
              j -> e.x[j] * vv1.v[j])) AS y
          FROM e CROSS JOIN vv1),
        s2 AS (
          SELECT t.j, ROUND(SUM(y2.x[t.j] * y2.y), 6) AS s
          FROM y2 CROSS JOIN range(1, 65) t(j) GROUP BY t.j),
        l2 AS (SELECT list(s ORDER BY j) AS sv FROM s2),
        n2 AS (
          SELECT sv, SQRT(list_sum(list_transform(sv, d -> d * d))) AS nrm
          FROM l2),
        fin AS (
          SELECT list_transform(sv, d -> ROUND(d / nrm, 6)) AS v,
            ROUND(nrm, 6) AS lambda
          FROM n2)"""

  /** Shared DuckDB replay of the IVF-PQ chain (cells, 2 Lloyd PQ
    * rounds, encode, LUTs, candidate scoring) up to the `scored`
    * CTE — s15 ranks it directly; s22 shortlists then re-ranks
    * exactly. */
  private val ivfPqScoredCtes: String =
    """WITH base AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, 65),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
          FROM embeddings),
        cpiv AS (
          SELECT vec_id AS pid, embedding AS pvec, nrm AS pnrm
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        sim AS (
          SELECT b.vec_id AS id, p.pid,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE)))
              / (b.nrm * p.pnrm) AS psim
          FROM base b CROSS JOIN cpiv p),
        assigned AS (
          SELECT id, pid AS cell FROM (
            SELECT id, pid, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, pid) AS prk
            FROM sim)
          WHERE prk <= 1),
        piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8),
        ss AS (SELECT UNNEST(range(0, 4)) AS sub),
        cn0 AS (
          SELECT s.sub, p.pid AS cell,
            list_transform(range(1, 17),
              i -> CAST(p.pvec[s.sub * 16 + i] AS DOUBLE)) AS cvec
          FROM piv p CROSS JOIN ss s),
        sv AS (
          SELECT vec_id AS id, s.sub,
            list_transform(range(1, 17),
              i -> CAST(embedding[s.sub * 16 + i] AS DOUBLE)) AS svec
          FROM embeddings CROSS JOIN ss s),
        d1 AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn0 c ON c.sub = v.sub),
        a1 AS (
          SELECT id, sub, cell FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d1)
          WHERE rk = 1),
        u1 AS (
          SELECT a.sub, a.cell, t.i, ROUND(AVG(v.svec[t.i]), 6) AS c
          FROM a1 a JOIN sv v ON v.id = a.id AND v.sub = a.sub
          CROSS JOIN range(1, 17) t(i)
          GROUP BY a.sub, a.cell, t.i),
        cn1 AS (
          SELECT sub, cell, list(c ORDER BY i) AS cvec
          FROM u1 GROUP BY sub, cell),
        d2s AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn1 c ON c.sub = v.sub),
        a2 AS (
          SELECT id, sub, cell FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d2s)
          WHERE rk = 1),
        u2 AS (
          SELECT a.sub, a.cell, t.i, ROUND(AVG(v.svec[t.i]), 6) AS c
          FROM a2 a JOIN sv v ON v.id = a.id AND v.sub = a.sub
          CROSS JOIN range(1, 17) t(i)
          GROUP BY a.sub, a.cell, t.i),
        cn2 AS (
          SELECT sub, cell, list(c ORDER BY i) AS cvec
          FROM u2 GROUP BY sub, cell),
        d3 AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn2 c ON c.sub = v.sub),
        codes AS (
          SELECT id AS id_b, sub, cell AS code FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d3)
          WHERE rk = 1),
        luts AS (
          SELECT id AS id_a, sub, cell AS code, d2 AS lut FROM d3),
        pairs AS (
          SELECT a.id AS id_a, b.id AS id_b
          FROM assigned a JOIN assigned b
            ON a.cell = b.cell AND a.id <> b.id),
        scored AS (
          SELECT p.id_a, p.id_b, ROUND(SUM(l.lut), 6) AS approx_d2
          FROM pairs p
          JOIN codes c ON c.id_b = p.id_b
          JOIN luts l ON l.id_a = p.id_a AND l.sub = c.sub AND l.code = c.code
          GROUP BY p.id_a, p.id_b)"""

  val all: Seq[Q] = Seq(

    // ── brute-force cosine top-k (exact ANN baseline) ───────────────
    // Oracle mirrors the double-precision left-to-right fold.
    // kernel variant: bit-identical to VectorOps.knnBruteForce (tested
    // in OpsSpec) with ~4x less row machinery at this pair count
    Q("s01_knn_cosine",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        VectorOps.knnBruteForceKernel(e, e, "vec_id", "embedding", 3)
          .orderBy("id_a", "rk")
      },
      Some("""WITH scored AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
             * SQRT(list_sum(list_transform(range(1, len(b.embedding) + 1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
            AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        ranked AS (
          SELECT id_a, id_b, cos,
            ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk
          FROM scored)
        SELECT id_a, rk, id_b, cos FROM ranked WHERE rk <= 3
        ORDER BY id_a, rk""")),

    // ── embedding-cosine near-dup pairs ─────────────────────────────
    Q("s02_embedding_near_dup",
      (s, dir) => VectorOps.cosineNearDupPairs(
        Tables.embeddings(s, dir), "vec_id", "embedding", 0.4)
        .orderBy("id_a", "id_b"),
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          list_sum(list_transform(range(1, len(a.embedding) + 1),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (SQRT(list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
           * SQRT(list_sum(list_transform(range(1, len(b.embedding) + 1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
          AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
            i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
          / (SQRT(list_sum(list_transform(range(1, len(a.embedding) + 1),
               i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
           * SQRT(list_sum(list_transform(range(1, len(b.embedding) + 1),
               i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
          >= 0.4
        ORDER BY id_a, id_b""")),

    // ── LSH-bucketed ANN (scale path; portable MD5-derived hyperplane
    //    matrix — the oracle recomputes buckets and the exact rerank) ─
    Q("s03_knn_lsh",
      (s, dir) => VectorOps.lshNearestNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding", numPlanes = 8, k = 3,
        portableDim = Some(64))
        .orderBy("id_a", "rk"),
      Some("""WITH w AS (
          SELECT p, list_transform(range(0, 64), i ->
            (('0x' || substr(md5(p::VARCHAR || ',' || i::VARCHAR), 1, 15))::BIGINT
              % 2000001) / 1000000.0 - 1.0) AS wt
          FROM range(8) t(p)),
        proj AS (
          SELECT e.vec_id, w.p,
            list_sum(list_transform(range(1, 65),
              i -> CAST(e.embedding[i] AS DOUBLE) * wt[i])) AS pr
          FROM embeddings e CROSS JOIN w),
        bucket AS (
          SELECT vec_id,
            CAST(SUM(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END)
              AS BIGINT) AS b
          FROM proj GROUP BY vec_id),
        nrm AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, 65),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS n
          FROM embeddings),
        scored AS (
          SELECT ba.vec_id AS id_a, bb.vec_id AS id_b,
            list_sum(list_transform(range(1, 65),
              i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
              / (ea.n * eb.n) AS cos
          FROM bucket ba JOIN bucket bb ON ba.b = bb.b AND ba.vec_id <> bb.vec_id
          JOIN nrm ea ON ea.vec_id = ba.vec_id
          JOIN nrm eb ON eb.vec_id = bb.vec_id),
        ranked AS (
          SELECT id_a, id_b, cos,
            ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk
          FROM scored)
        SELECT id_a, rk, id_b, cos FROM ranked WHERE rk <= 3
        ORDER BY id_a, rk""")),

    // ── IVF-bucketed ANN (portable pivots: lowest md5(id) — the
    //    oracle replays cell assignment and the exact rerank) ─────────
    Q("s05_knn_ivf",
      (s, dir) => VectorOps.ivfNearestNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, k = 3, probes = 2, portablePivots = true)
        .orderBy("id_a", "rk"),
      Some(s"""WITH $ivfKnnCtes
        SELECT id_a, rk, id_b, cos FROM ranked WHERE rk <= 3
        ORDER BY id_a, rk""")),

    // ── ANN recall@k report: the in-engine index-tuning loop — exact
    //    brute-force truth on a hash-sampled query subset vs the s05
    //    IVF plan; per-query hit count decides nCells/probes. ─────────
    Q("s17_ann_recall",
      (s, dir) => VectorOps.annRecallReport(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, k = 3, probes = 2, sampleMod = 20)
        .orderBy("id_a"),
      Some(s"""WITH $ivfKnnCtes,
        qs AS (SELECT vec_id FROM base
               WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT
                 % 20 = 0),
        tsc AS (
          SELECT qb.vec_id AS id_a, b.vec_id AS id_b,
            list_sum(list_transform(range(1, 65),
              i -> CAST(qb.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              / (qb.nrm * b.nrm) AS cos
          FROM qs q JOIN base qb ON qb.vec_id = q.vec_id
          CROSS JOIN base b
          WHERE b.vec_id <> q.vec_id),
        truth AS (
          SELECT id_a, id_b FROM (
            SELECT id_a, id_b, ROW_NUMBER() OVER
              (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk
            FROM tsc)
          WHERE rk <= 3),
        ap AS (
          SELECT id_a, id_b FROM ranked
          WHERE rk <= 3
            AND ('0x' || substr(md5(id_a::VARCHAR), 1, 15))::BIGINT % 20 = 0)
        SELECT t.id_a, CAST(COUNT(a.id_b) AS BIGINT) AS n_hits,
          CAST(COUNT(a.id_b) AS DOUBLE) / 3.0 AS recall
        FROM truth t
        LEFT JOIN ap a ON a.id_a = t.id_a AND a.id_b = t.id_b
        GROUP BY t.id_a ORDER BY t.id_a""")),

    // ── SQ8 ANN with asymmetric distance: int8 corpus codes + FP
    //    queries (FAISS IndexScalarQuantizer shape) — the scalar-
    //    quantizer sibling of s15's PQ-ADC, on the s17 query sample ───
    Q("s18_knn_sq8",
      (s, dir) => VectorOps.sq8NearestNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 3, sampleMod = 20)
        .orderBy("id_a", "rk"),
      Some("""WITH base AS (
          SELECT vec_id,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
            list_max(list_transform(embedding,
              x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
          FROM embeddings),
        codes AS (
          SELECT vec_id AS id_b, scale,
            CASE WHEN scale = 0.0
              THEN list_transform(v, x -> CAST(0 AS BIGINT))
              ELSE list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
            END AS q
          FROM base),
        qs AS (
          SELECT vec_id AS id_a, v AS vec_a FROM base
          WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT
            % 20 = 0),
        scored AS (
          SELECT q2.id_a, c.id_b,
            c.scale * list_sum(list_transform(range(1, 65),
              i -> CAST(c.q[i] AS DOUBLE) * q2.vec_a[i])) AS adc
          FROM codes c CROSS JOIN qs q2
          WHERE c.id_b <> q2.id_a),
        ranked AS (
          SELECT id_a, id_b, adc,
            ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY adc DESC, id_b) AS rk
          FROM scored)
        SELECT id_a, rk, id_b, adc FROM ranked WHERE rk <= 3
        ORDER BY id_a, rk""")),

    // ── IVF cell centroids — the index-maintenance / k-means step:
    //    element-wise mean per cell (probes=1 assignment), rounded to
    //    6 dp for cross-engine summation-order independence ───────────
    Q("s06_ivf_centroids",
      (s, dir) => VectorOps.ivfCellCentroids(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, portablePivots = true)
        .orderBy("cell", "i"),
      Some("""WITH base AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, 65),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
          FROM embeddings),
        piv AS (
          SELECT vec_id AS pid, embedding AS pvec, nrm AS pnrm
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        sim AS (
          SELECT b.vec_id AS id, p.pid,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE)))
              / (b.nrm * p.pnrm) AS psim
          FROM base b CROSS JOIN piv p),
        assigned AS (
          SELECT id, pid AS cell FROM (
            SELECT id, pid, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, pid) AS prk
            FROM sim)
          WHERE prk <= 1)
        SELECT a.cell, t.i,
          ROUND(AVG(CAST(b.embedding[t.i] AS DOUBLE)), 6) AS c,
          COUNT(*) AS n
        FROM assigned a
        JOIN base b ON b.vec_id = a.id
        CROSS JOIN range(1, 65) t(i)
        GROUP BY a.cell, t.i
        ORDER BY cell, i""")),

    // ── SemDeDup census: IVF cells → intra-cell cosine edges →
    //    min-label connected components; keep is_canonical=1 ─────────
    Q("s09_semantic_dedup",
      (s, dir) => VectorOps.semanticDedupClusters(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, threshold = 0.4, probes = 1, portablePivots = true)
        .withColumnRenamed("doc_id", "vec_id")
        .orderBy("vec_id"),
      Some("""WITH RECURSIVE base AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, 65),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))) AS nrm
          FROM embeddings),
        piv AS (
          SELECT vec_id AS pid, embedding AS pvec, nrm AS pnrm
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        sim AS (
          SELECT b.vec_id AS id, p.pid,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * CAST(p.pvec[i] AS DOUBLE)))
              / (b.nrm * p.pnrm) AS psim
          FROM base b CROSS JOIN piv p),
        assigned AS (
          SELECT id, pid AS cell FROM (
            SELECT id, pid, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, pid) AS prk
            FROM sim)
          WHERE prk <= 1),
        scored AS (
          SELECT DISTINCT a.id AS id_a, b.id AS id_b
          FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.id < b.id
          JOIN base ea ON ea.vec_id = a.id
          JOIN base eb ON eb.vec_id = b.id
          WHERE list_sum(list_transform(range(1, 65),
              i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
              / (ea.nrm * eb.nrm) >= 0.4),
        edges AS (
          SELECT id_a AS u, id_b AS v FROM scored
          UNION ALL SELECT id_b AS u, id_a AS v FROM scored),
        reach(node, lbl) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node),
        lab AS (
          SELECT node AS vec_id, MIN(lbl) AS cluster_id
          FROM reach GROUP BY node),
        sz AS (
          SELECT cluster_id, COUNT(*) AS cluster_size FROM lab GROUP BY 1)
        SELECT l.vec_id, l.cluster_id, s.cluster_size,
          CAST(l.vec_id = l.cluster_id AS INT) AS is_canonical
        FROM lab l JOIN sz s USING (cluster_id)
        ORDER BY l.vec_id""")),

    // ── per-label centroid-ish stats: vector column aggregation ─────
    Q("s04_label_norms",
      (s, dir) => Tables.embeddings(s, dir)
        .select(col("label"), VectorOps.norm(col("embedding")).as("nrm"))
        .groupBy("label")
        .agg(count(lit(1)).as("n"),
          min(col("nrm")).as("min_norm"), max(col("nrm")).as("max_norm"))
        .orderBy("label"),
      Some("""SELECT label, COUNT(*) AS n,
        MIN(SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))) AS min_norm,
        MAX(SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
          i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))) AS max_norm
        FROM embeddings GROUP BY label ORDER BY label""")),

    // ── int8 symmetric quantization report: scale, checksum, max
    //    dequantization error — every step deterministic IEEE ────────
    Q("s07_quantize_int8",
      (s, dir) => VectorOps.quantizeInt8Report(
        Tables.embeddings(s, dir), "vec_id", "embedding")
        .orderBy("vec_id"),
      Some("""WITH v AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
          FROM embeddings),
        sc AS (
          SELECT vec_id, dv,
            list_max(list_transform(dv, x -> abs(x))) / 127.0 AS scale
          FROM v),
        q AS (
          SELECT vec_id, dv, scale,
            CASE WHEN scale = 0 THEN list_transform(dv, x -> CAST(0 AS BIGINT))
                 ELSE list_transform(dv, x -> CAST(floor(x / scale + 0.5) AS BIGINT))
            END AS qv
          FROM sc)
        SELECT vec_id, scale,
          CAST(list_sum(qv) AS BIGINT) AS sum_q,
          list_max(list_transform(range(1, len(dv) + 1),
            i -> abs(qv[i] * scale - dv[i]))) AS max_abs_err
        FROM q ORDER BY vec_id""")),

    // ── product quantization: m=4 subspaces × 8 deterministic
    //    codewords — the IVF-PQ compression step (m bytes/vector).
    //    Argmin is a partial-aggregatable min(struct), not a window;
    //    portable pivots make codes engine-reproducible. ──────────────
    Q("s08_pq_codes",
      (s, dir) => VectorOps.pqCodes(Tables.embeddings(s, dir),
        "vec_id", "embedding", m = 4, nCentroids = 8, dim = 64,
        portablePivots = true)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "sub"),
      Some("""WITH piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8),
        sub AS (
          SELECT vec_id AS id, s.sub, embedding
          FROM embeddings CROSS JOIN (SELECT UNNEST(range(0, 4)) AS sub) s),
        dist AS (
          SELECT id, sub, pid,
            list_sum(list_transform(range(1, 17),
              i -> (CAST(embedding[sub * 16 + i] AS DOUBLE)
                    - CAST(pvec[sub * 16 + i] AS DOUBLE))
                 * (CAST(embedding[sub * 16 + i] AS DOUBLE)
                    - CAST(pvec[sub * 16 + i] AS DOUBLE)))) AS d2
          FROM sub CROSS JOIN piv),
        best AS (
          SELECT id, sub, pid, d2, ROW_NUMBER() OVER
            (PARTITION BY id, sub ORDER BY d2, pid) AS rk
          FROM dist)
        SELECT id AS vec_id, sub, pid AS code, ROUND(d2, 6) AS sq_err
        FROM best WHERE rk = 1 ORDER BY vec_id, sub""")),

    // ── k-means trainer (2 Lloyd rounds, portable pivots) — the
    //    coarse-quantizer TRAINING step the IVF family assumes. The
    //    oracle unrolls both rounds; 6-dp centroid snapping after each
    //    round makes round-2 inputs bit-identical across engines, so
    //    the whole iteration is hash-EXACT, not just round 1. ─────────
    Q("s10_kmeans_train",
      (s, dir) => VectorOps.kmeansTrain(Tables.embeddings(s, dir),
        "vec_id", "embedding", k = 8, iters = 2, portablePivots = true)
        .orderBy("cell", "i"),
      Some(kmeansSql(
        """piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8)"""))),

    // ── production flavor: pivot order by Spark's SIGNED
    //    xxhash64(vec_id) — hash-EXACT because the oracle recomputes
    //    the long-key XXH64 (XxHashSql) like q53/q54 do. ──────────────
    Q("s11_kmeans_train_fast",
      (s, dir) => VectorOps.kmeansTrain(Tables.embeddings(s, dir),
        "vec_id", "embedding", k = 8, iters = 2, portablePivots = false)
        .orderBy("cell", "i"),
      Some(kmeansSql(
        s"""keys AS (SELECT vec_id AS pid, vec_id::HUGEINT AS k FROM base),
        ${XxHashSql.keyHashSignedCtes("pid")},
        piv AS (
          SELECT b.vec_id AS pid, b.embedding AS pvec
          FROM base b JOIN key_hash_signed s ON s.pid = b.vec_id
          ORDER BY s.hv, b.vec_id LIMIT 8)"""))),

    // ── end-to-end trained-IVF ANN: 2 Lloyd rounds -> assign to the
    //    TRAINED centroids -> exact intra-cell top-k — the FAISS-style
    //    train/assign/search pipeline, every stage oracle-replayed. ───
    Q("s12_knn_ivf_trained",
      (s, dir) => VectorOps.ivfNearestNeighborsTrained(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 8, k = 3, iters = 2, portablePivots = true)
        .orderBy("id_a", "rk"),
      Some(kmeansCtes(
        """piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8)""") +
        """,
        cn2 AS (
          SELECT cell, cvec,
            SQRT(list_sum(list_transform(cvec, x -> x * x))) AS cnrm
          FROM (SELECT cell, list(c ORDER BY i) AS cvec FROM u2 GROUP BY cell)),
        s3 AS (
          SELECT b.vec_id AS id, c.cell,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * c.cvec[i]))
              / (b.nrm * c.cnrm) AS psim
          FROM base b CROSS JOIN cn2 c),
        a3 AS (
          SELECT id, cell FROM (
            SELECT id, cell, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, cell) AS rk FROM s3)
          WHERE rk = 1),
        scored AS (
          SELECT x.id AS id_a, y.id AS id_b,
            list_sum(list_transform(range(1, 65),
              i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)))
              / (ea.nrm * eb.nrm) AS cos
          FROM a3 x JOIN a3 y ON x.cell = y.cell AND x.id <> y.id
          JOIN base ea ON ea.vec_id = x.id
          JOIN base eb ON eb.vec_id = y.id),
        ranked AS (
          SELECT id_a, id_b, cos,
            ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk
          FROM scored)
        SELECT id_a, rk, id_b, cos FROM ranked WHERE rk <= 3
        ORDER BY id_a, rk""")),

    // ── PQ codebook TRAINING: per-subspace L2 k-means (2 Lloyd
    //    rounds), refining s08's hash-picked codewords into trained
    //    codebooks. All 4 subspaces unroll through the same CTE
    //    chain; 6-dp mean snapping keeps round 2 bit-identical. ───────
    Q("s13_pq_train",
      (s, dir) => VectorOps.pqTrain(Tables.embeddings(s, dir),
        "vec_id", "embedding", m = 4, nCentroids = 8, dim = 64,
        iters = 2, portablePivots = true)
        .orderBy("sub", "cell", "i"),
      Some("""WITH piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8),
        ss AS (SELECT UNNEST(range(0, 4)) AS sub),
        cn0 AS (
          SELECT s.sub, p.pid AS cell,
            list_transform(range(1, 17),
              i -> CAST(p.pvec[s.sub * 16 + i] AS DOUBLE)) AS cvec
          FROM piv p CROSS JOIN ss s),
        sv AS (
          SELECT vec_id AS id, s.sub,
            list_transform(range(1, 17),
              i -> CAST(embedding[s.sub * 16 + i] AS DOUBLE)) AS svec
          FROM embeddings CROSS JOIN ss s),
        d1 AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn0 c ON c.sub = v.sub),
        a1 AS (
          SELECT id, sub, cell FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d1)
          WHERE rk = 1),
        u1 AS (
          SELECT a.sub, a.cell, t.i, ROUND(AVG(v.svec[t.i]), 6) AS c
          FROM a1 a JOIN sv v ON v.id = a.id AND v.sub = a.sub
          CROSS JOIN range(1, 17) t(i)
          GROUP BY a.sub, a.cell, t.i),
        cn1 AS (
          SELECT sub, cell, list(c ORDER BY i) AS cvec
          FROM u1 GROUP BY sub, cell),
        d2s AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn1 c ON c.sub = v.sub),
        a2 AS (
          SELECT id, sub, cell FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d2s)
          WHERE rk = 1)
        SELECT a.sub, a.cell, t.i, ROUND(AVG(v.svec[t.i]), 6) AS c,
          COUNT(*) AS n
        FROM a2 a JOIN sv v ON v.id = a.id AND v.sub = a.sub
        CROSS JOIN range(1, 17) t(i)
        GROUP BY a.sub, a.cell, t.i
        ORDER BY a.sub, a.cell, t.i""")),

    // ── PQ encode with TRAINED codebooks: the full train -> encode
    //    pipeline (s13's 2 Lloyd rounds, then s08's code assignment
    //    against the refined codebooks) ───────────────────────────────
    Q("s14_pq_codes_trained",
      (s, dir) => VectorOps.pqCodesTrained(Tables.embeddings(s, dir),
        "vec_id", "embedding", m = 4, nCentroids = 8, dim = 64,
        iters = 2, portablePivots = true)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id", "sub"),
      Some("""WITH piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM embeddings ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8),
        ss AS (SELECT UNNEST(range(0, 4)) AS sub),
        cn0 AS (
          SELECT s.sub, p.pid AS cell,
            list_transform(range(1, 17),
              i -> CAST(p.pvec[s.sub * 16 + i] AS DOUBLE)) AS cvec
          FROM piv p CROSS JOIN ss s),
        sv AS (
          SELECT vec_id AS id, s.sub,
            list_transform(range(1, 17),
              i -> CAST(embedding[s.sub * 16 + i] AS DOUBLE)) AS svec
          FROM embeddings CROSS JOIN ss s),
        d1 AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn0 c ON c.sub = v.sub),
        a1 AS (
          SELECT id, sub, cell FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d1)
          WHERE rk = 1),
        u1 AS (
          SELECT a.sub, a.cell, t.i, ROUND(AVG(v.svec[t.i]), 6) AS c
          FROM a1 a JOIN sv v ON v.id = a.id AND v.sub = a.sub
          CROSS JOIN range(1, 17) t(i)
          GROUP BY a.sub, a.cell, t.i),
        cn1 AS (
          SELECT sub, cell, list(c ORDER BY i) AS cvec
          FROM u1 GROUP BY sub, cell),
        d2s AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn1 c ON c.sub = v.sub),
        a2 AS (
          SELECT id, sub, cell FROM (
            SELECT id, sub, cell, ROW_NUMBER() OVER
              (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d2s)
          WHERE rk = 1),
        u2 AS (
          SELECT a.sub, a.cell, t.i, ROUND(AVG(v.svec[t.i]), 6) AS c
          FROM a2 a JOIN sv v ON v.id = a.id AND v.sub = a.sub
          CROSS JOIN range(1, 17) t(i)
          GROUP BY a.sub, a.cell, t.i),
        cn2 AS (
          SELECT sub, cell, list(c ORDER BY i) AS cvec
          FROM u2 GROUP BY sub, cell),
        d3 AS (
          SELECT v.id, v.sub, c.cell,
            list_sum(list_transform(range(1, 17),
              i -> (v.svec[i] - c.cvec[i]) * (v.svec[i] - c.cvec[i]))) AS d2
          FROM sv v JOIN cn2 c ON c.sub = v.sub)
        SELECT id AS vec_id, sub, cell AS code, ROUND(d2, 6) AS sq_err
        FROM (
          SELECT id, sub, cell, d2, ROW_NUMBER() OVER
            (PARTITION BY id, sub ORDER BY d2, cell) AS rk FROM d3)
        WHERE rk = 1 ORDER BY vec_id, sub""")),

    // ── IVF-PQ ANN with ADC (the FAISS IndexIVFPQ shape): IVF cells
    //    gate candidates, PQ codes + per-query LUTs score them — the
    //    oracle replays cell assignment, both PQ training rounds, the
    //    encode, the LUT build, and the approximate rerank. ───────────
    Q("s15_knn_ivfpq",
      (s, dir) => VectorOps.ivfPqNearestNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, m = 4, nCentroids = 8, dim = 64,
        k = 3, iters = 2, portablePivots = true)
        .orderBy("id_a", "rk"),
      Some(ivfPqScoredCtes + """
        SELECT id_a, rk, id_b, approx_d2 FROM (
          SELECT id_a, id_b, approx_d2, ROW_NUMBER() OVER
            (PARTITION BY id_a ORDER BY approx_d2, id_b) AS rk
          FROM scored)
        WHERE rk <= 3 ORDER BY id_a, rk""")),

    // ── two-stage ANN: the same IVF-PQ chain produces a 10-candidate
    //    approximate shortlist per query; full-precision vectors then
    //    re-rank ONLY those pairs by exact squared L2 (the FAISS
    //    refine/rerank search shape). Oracle = s15's replayed chain +
    //    an exact-distance join on the shortlist ───────────────────────
    Q("s22_knn_rerank",
      (s, dir) => VectorOps.ivfPqRerankNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, m = 4, nCentroids = 8, dim = 64,
        k = 3, shortlist = 10, iters = 2, portablePivots = true)
        .orderBy("id_a", "rk"),
      Some(ivfPqScoredCtes + """,
        shortlist AS (
          SELECT id_a, id_b, approx_d2 FROM (
            SELECT id_a, id_b, approx_d2, ROW_NUMBER() OVER
              (PARTITION BY id_a ORDER BY approx_d2, id_b) AS prk
            FROM scored)
          WHERE prk <= 10),
        ex AS (
          SELECT s.id_a, s.id_b, s.approx_d2,
            ROUND(list_sum(list_transform(range(1, 65),
              i -> (CAST(ea.embedding[i] AS DOUBLE)
                  - CAST(eb.embedding[i] AS DOUBLE))
                * (CAST(ea.embedding[i] AS DOUBLE)
                  - CAST(eb.embedding[i] AS DOUBLE)))), 6) AS exact_d2
          FROM shortlist s
          JOIN embeddings ea ON ea.vec_id = s.id_a
          JOIN embeddings eb ON eb.vec_id = s.id_b)
        SELECT id_a, rk, id_b, exact_d2, approx_d2 FROM (
          SELECT id_a, id_b, exact_d2, approx_d2, ROW_NUMBER() OVER
            (PARTITION BY id_a ORDER BY exact_d2, id_b) AS rk
          FROM ex)
        WHERE rk <= 3 ORDER BY id_a, rk""")),


    // ── embedding outlier report: trained k-means cells -> similarity
    //    to own centroid -> per-cell z-score + bottom-pct RANK flag
    //    (rank, not threshold: the flag stays integer-deterministic).
    //    Oracle replays both Lloyd rounds (kmeansCtes), the assignment,
    //    the snapped moments, and the rank. ───────────────────────────
    Q("s16_embedding_outliers",
      (s, dir) => VectorOps.embeddingOutliers(Tables.embeddings(s, dir),
        "vec_id", "embedding", nCells = 8, iters = 2, pct = 0.1,
        portablePivots = true)
        .orderBy("id"),
      Some(kmeansCtes(
        """piv AS (
          SELECT vec_id AS pid, embedding AS pvec
          FROM base ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 8)""") +
        """,
        cn2 AS (
          SELECT cell, cvec,
            SQRT(list_sum(list_transform(cvec, x -> x * x))) AS cnrm
          FROM (SELECT cell, list(c ORDER BY i) AS cvec FROM u2 GROUP BY cell)),
        s3 AS (
          SELECT b.vec_id AS id, c.cell,
            list_sum(list_transform(range(1, 65),
              i -> CAST(b.embedding[i] AS DOUBLE) * c.cvec[i]))
              / (b.nrm * c.cnrm) AS psim
          FROM base b CROSS JOIN cn2 c),
        a3 AS (
          SELECT id, cell, psim FROM (
            SELECT id, cell, psim, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY psim DESC, cell) AS rk FROM s3)
          WHERE rk = 1),
        st AS (
          SELECT cell, COUNT(*) AS n_cell,
            ROUND(AVG(psim), 6) AS mu,
            ROUND(AVG(psim * psim) - AVG(psim) * AVG(psim), 6) AS vr
          FROM a3 GROUP BY cell),
        rk2 AS (
          SELECT a.id, a.cell, a.psim AS sim, s.mu, s.vr, s.n_cell,
            ROW_NUMBER() OVER
              (PARTITION BY a.cell ORDER BY a.psim ASC, a.id ASC) AS rnk
          FROM a3 a JOIN st s USING (cell))
        SELECT id, cell, sim,
          CASE WHEN vr > 0.0 THEN ROUND((sim - mu) / SQRT(vr), 6)
               ELSE 0.0 END AS z,
          CAST(rnk <= CEIL(0.1 * n_cell) AS INT) AS is_outlier
        FROM rk2 ORDER BY id""")),

    // ── semantic decontamination: d11's train/eval contract at
    //    embedding granularity — corpus vectors cosine-close to the
    //    hash-sampled eval set, candidates gated by shared IVF cells
    //    (one assignment pass, eval side broadcast). ──────────────────
    Q("d28_semantic_decontam",
      (s, dir) => VectorOps.semanticDecontaminate(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        evalMod = 20, nCells = 16, threshold = 0.4, probes = 2,
        portablePivots = true)
        .withColumnRenamed("id", "vec_id")
        .orderBy("vec_id"),
      Some(s"""WITH $ivfAssignCtes,
        cp AS (
          SELECT cell, id FROM assigned
          WHERE ('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT % 20 <> 0),
        ev AS (
          SELECT cell, id AS eval_id FROM assigned
          WHERE ('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT % 20 = 0),
        sc AS (
          SELECT DISTINCT c.id, e.eval_id,
            list_sum(list_transform(range(1, 65),
              i -> CAST(ba.embedding[i] AS DOUBLE) * CAST(bb.embedding[i] AS DOUBLE)))
              / (ba.nrm * bb.nrm) AS cos
          FROM cp c JOIN ev e ON e.cell = c.cell
          JOIN base ba ON ba.vec_id = c.id
          JOIN base bb ON bb.vec_id = e.eval_id),
        f AS (SELECT * FROM sc WHERE cos >= 0.4),
        agg AS (
          SELECT id, CAST(COUNT(DISTINCT eval_id) AS BIGINT) AS n_eval_hits
          FROM f GROUP BY id),
        top AS (
          SELECT id, cos AS max_cos, eval_id FROM (
            SELECT id, cos, eval_id, ROW_NUMBER() OVER
              (PARTITION BY id ORDER BY cos DESC, eval_id) AS rk
            FROM f)
          WHERE rk = 1)
        SELECT a.id AS vec_id, a.n_eval_hits, t.max_cos, t.eval_id
        FROM agg a JOIN top t USING (id) ORDER BY vec_id""")),

    // ── s21: label-centroid drift — pairwise cosine between per-label
    //    mean embeddings (6 dp-snapped, s06's contract): the
    //    embedding-space separation/drift monitor; corpus read once
    //    into labels × dim cells, pairwise on labels² rows ─────────────
    Q("s21_centroid_drift",
      (s, dir) => VectorOps.labelCentroidDrift(
        Tables.embeddings(s, dir), "embedding", "label")
        .orderBy("label_a", "label_b"),
      Some("""WITH x AS (
          SELECT label, i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN range(1, 65) t(i)),
        c AS (
          SELECT label, i, ROUND(AVG(x), 6) AS c
          FROM x GROUP BY label, i),
        v AS (
          SELECT label, list(c ORDER BY i) AS cv FROM c GROUP BY label)
        SELECT a.label AS label_a, b.label AS label_b,
          list_sum(list_transform(range(1, 65),
            i -> a.cv[i] * b.cv[i]))
          / (SQRT(list_sum(list_transform(range(1, 65), i -> a.cv[i] * a.cv[i])))
           * SQRT(list_sum(list_transform(range(1, 65), i -> b.cv[i] * b.cv[i]))))
            AS cos_centroid
        FROM v a JOIN v b ON a.label < b.label
        ORDER BY label_a, label_b""")),

    // ── s19: maximum-inner-product search — top-k by RAW dot product
    //    (magnitude-sensitive retrieval); scale path is the norm-
    //    augmentation reduction to cosine (see mipsBruteForceKernel) ──
    Q("s19_mips",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        VectorOps.mipsBruteForceKernel(e, e, "vec_id", "embedding", 3)
          .orderBy("id_a", "rk")
      },
      Some("""WITH scored AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            AS dot
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
        ranked AS (
          SELECT id_a, id_b, dot,
            ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY dot DESC, id_b) AS rk
          FROM scored)
        SELECT id_a, rk, id_b, dot FROM ranked WHERE rk <= 3
        ORDER BY id_a, rk""")),

    // ── s23: top principal direction by power iteration on the Gram
    //    operator (covariance never materialized) — the anisotropy /
    //    whitening-prep diagnostic. Oracle unrolls both rounds with
    //    the same 6-dp snap discipline as the Lloyd trainers ────────────
    Q("s23_principal_component",
      (s, dir) => VectorOps.principalComponent(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = 64, iters = 2)
        .orderBy("i"),
      Some(pcaFinCtes + """,
        tss AS (
          SELECT ROUND(SUM(list_sum(list_transform(x, a -> a * a))), 6) AS t
          FROM e)
        SELECT t2.j AS i, fin.v[t2.j] AS loading, fin.lambda AS eigenvalue,
          ROUND(fin.lambda / tss.t, 6) AS explained_share
        FROM fin CROSS JOIN tss CROSS JOIN range(1, 65) t2(j)
        ORDER BY i""")),

    // ── s25: all-but-the-top cleanup — remove the dominant common
    //    direction (s23's component): per-vector projection + residual
    //    norm. The cleanup is a narrow scan against the broadcast
    //    literal direction ──────────────────────────────────────────────
    Q("s25_remove_top_component",
      (s, dir) => VectorOps.removeTopComponent(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        dim = 64, iters = 2)
        .orderBy("vec_id"),
      Some(pcaFinCtes + """,
        pr AS (
          SELECT e.vec_id, e.x,
            list_sum(list_transform(range(1, 65),
              j -> e.x[j] * fin.v[j])) AS proj
          FROM e CROSS JOIN fin)
        SELECT pr.vec_id, ROUND(pr.proj, 6) AS top_projection,
          ROUND(SQRT(list_sum(list_transform(range(1, 65),
            j -> (pr.x[j] - pr.proj * fin.v[j])
              * (pr.x[j] - pr.proj * fin.v[j])))), 6) AS residual_norm
        FROM pr CROSS JOIN fin ORDER BY pr.vec_id""")),

    // ── s24: IVF cell-balance diagnostic — per-cell population, load
    //    factor vs the uniform mean, and the max-cell imbalance (the
    //    health check that decides nCells/salting before an IVF index
    //    ships: one hot cell = one hot candidate shuffle). Cells-many
    //    rows + a 1-row totals broadcast ────────────────────────────────
    Q("s24_ivf_balance",
      (s, dir) => {
        val cells = VectorOps.ivfAssign(Tables.embeddings(s, dir),
          "vec_id", "embedding", nCells = 16, probes = 2,
          portablePivots = true)
        val per = cells.groupBy("cell").agg(count(lit(1)).as("n_vecs"))
        val tot = per.agg(sum(col("n_vecs")).as("n_total"),
          count(lit(1)).as("n_cells"), max(col("n_vecs")).as("mx"))
        val mean = col("n_total").cast("double") / col("n_cells")
        per.crossJoin(broadcast(tot))
          .select(col("cell"), col("n_vecs"),
            round(col("n_vecs").cast("double") / mean, 6).as("load_factor"),
            round(col("mx").cast("double") / mean, 6).as("imbalance"))
          .orderBy("cell")
      },
      Some(s"""WITH $ivfAssignCtes,
        per AS (
          SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs
          FROM assigned GROUP BY cell),
        t AS (
          SELECT CAST(SUM(n_vecs) AS BIGINT) AS n_total,
            CAST(COUNT(*) AS BIGINT) AS n_cells,
            CAST(MAX(n_vecs) AS BIGINT) AS mx
          FROM per)
        SELECT cell, n_vecs,
          ROUND(CAST(n_vecs AS DOUBLE)
            / (CAST(n_total AS DOUBLE) / n_cells), 6) AS load_factor,
          ROUND(CAST(mx AS DOUBLE)
            / (CAST(n_total AS DOUBLE) / n_cells), 6) AS imbalance
        FROM per CROSS JOIN t ORDER BY cell""")),

    // ── s26: batch-hard triplet mining — per anchor the hardest
    //    same-label positive + hardest cross-label negative and the
    //    margin-violation flag (the metric-learning trainer's input
    //    rows). Broadcast all-pairs (mining is per-batch by
    //    construction) folded to one row per anchor by order-
    //    independent struct argmin/argmax before the single shuffle ─────
    Q("s26_triplet_mining",
      (s, dir) => VectorOps.tripletMine(Tables.embeddings(s, dir),
        "vec_id", "embedding", "label", margin = 0.05)
        .orderBy("id_a"),
      Some("""WITH nrm AS (
          SELECT vec_id, label, embedding,
            SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
              AS nrm
          FROM embeddings),
        sc AS (
          SELECT a.vec_id AS id_a, a.label AS label,
            b.vec_id AS id_b, b.label AS label_b,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              / (a.nrm * b.nrm) AS cos
          FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id),
        pos AS (
          SELECT id_a, label, id_b AS id_pos, cos AS cos_pos,
            ROW_NUMBER() OVER (PARTITION BY id_a
              ORDER BY cos ASC, id_b) AS rk
          FROM sc WHERE label_b = label),
        neg AS (
          SELECT id_a, id_b AS id_neg, cos AS cos_neg,
            ROW_NUMBER() OVER (PARTITION BY id_a
              ORDER BY cos DESC, id_b) AS rk
          FROM sc WHERE label_b <> label)
        SELECT p.id_a, p.label, p.id_pos, p.cos_pos,
          n.id_neg, n.cos_neg,
          n.cos_neg > p.cos_pos - 0.05 AS violation
        FROM pos p JOIN neg n ON n.id_a = p.id_a
        WHERE p.rk = 1 AND n.rk = 1
        ORDER BY p.id_a""")),

    // ── s27: MMR diversified rerank — per query (every 50th vector)
    //    the greedy Maximal-Marginal-Relevance pick of 4 from the
    //    top-8 cosine candidates at λ=0.7: relevance traded against
    //    redundancy, the RAG/search diversification step. The greedy
    //    loop unrolls into 4 bounded per-query stages; the oracle
    //    replays each round as its own CTE ──────────────────────────────
    // ── s32: reciprocal-rank fusion — the standard hybrid-retrieval
    //    merge (Cormack et al. 2009): the cosine and raw-dot (MIPS)
    //    top-8 lists fuse per query by Σ 1/(60+rank), fused top-5 out.
    //    Both legs are the proven kernels; the fusion is an id-keyed
    //    outer join + a two-term scalar — at scale each leg is its own
    //    bucketed tier and fusion stays per-query bounded ────────────────
    Q("s32_rrf_fusion",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val qs = e.where(col("vec_id") % 50 === 0)
        val cosL = VectorOps.knnBruteForceKernel(qs, e,
            "vec_id", "embedding", 8)
          .select(col("id_a").as("query_id"), col("id_b").as("cand"),
            col("rk").as("rk_cos"))
        val mipsL = VectorOps.mipsBruteForceKernel(qs, e,
            "vec_id", "embedding", 8)
          .select(col("id_a").as("query_id"), col("id_b").as("cand"),
            col("rk").as("rk_dot"))
        val fused = cosL.join(mipsL, Seq("query_id", "cand"), "full_outer")
          .select(col("query_id"), col("cand"),
            (coalesce(lit(1.0) / (lit(60) + col("rk_cos")), lit(0.0))
              + coalesce(lit(1.0) / (lit(60) + col("rk_dot")), lit(0.0)))
              .as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("score").desc, col("cand"))
        fused.withColumn("fused_rank", row_number().over(w))
          .where(col("fused_rank") <= 5)
          .select(col("query_id"), col("fused_rank"),
            col("cand").as("vec_id"), round(col("score"), 6).as("rrf_score"))
          .orderBy("query_id", "fused_rank")
      },
      Some("""WITH nrm AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
              AS nrm
          FROM embeddings),
        sc AS (
          SELECT a.vec_id AS query_id, b.vec_id AS cand,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              AS dot,
            a.nrm * b.nrm AS nn
          FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 50 = 0),
        ca AS (
          SELECT query_id, cand, rk_cos FROM (
            SELECT query_id, cand, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY dot / nn DESC, cand) AS rk_cos
            FROM sc) WHERE rk_cos <= 8),
        da AS (
          SELECT query_id, cand, rk_dot FROM (
            SELECT query_id, cand, ROW_NUMBER() OVER (
              PARTITION BY query_id ORDER BY dot DESC, cand) AS rk_dot
            FROM sc) WHERE rk_dot <= 8),
        fu AS (
          SELECT COALESCE(ca.query_id, da.query_id) AS query_id,
            COALESCE(ca.cand, da.cand) AS cand,
            COALESCE(1.0 / (60 + rk_cos), 0.0)
              + COALESCE(1.0 / (60 + rk_dot), 0.0) AS score
          FROM ca FULL OUTER JOIN da
            ON da.query_id = ca.query_id AND da.cand = ca.cand)
        SELECT query_id, fused_rank, cand AS vec_id,
          ROUND(score, 6) AS rrf_score
        FROM (
          SELECT query_id, cand, score,
            CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY score DESC, cand) AS INT) AS fused_rank
          FROM fu)
        WHERE fused_rank <= 5
        ORDER BY query_id, fused_rank""")),

    // ── s31: retrieval nDCG@5 — ranking quality of the cosine
    //    retriever with label agreement as binary gain: DCG over the
    //    ranked top-5, ideal DCG from the relevant count, per-query
    //    nDCG (0 when nothing relevant — both engines' convention).
    //    DCG folds rank-ordered (the p27 determinism rule); kernel
    //    candidate generation, labels broadcast twice ───────────────────
    Q("s31_ndcg",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val nn = VectorOps.knnBruteForceKernel(
          e.where(col("vec_id") % 50 === 0), e, "vec_id", "embedding", 5)
        val lq = e.select(col("vec_id").as("id_a"), col("label").as("lq"))
        val ln = e.select(col("vec_id").as("id_b"), col("label").as("ln"))
        val gains = nn.join(broadcast(lq), Seq("id_a"))
          .join(broadcast(ln), Seq("id_b"))
          .select(col("id_a").as("query_id"), col("rk"),
            (col("lq") === col("ln")).cast("int").as("gain"))
        val per = gains.groupBy("query_id")
          .agg(sum(col("gain")).cast("long").as("n_relevant"),
            aggregate(transform(
              sort_array(collect_list(struct(col("rk"),
                (col("gain").cast("double")
                  / log(2.0, col("rk").cast("double") + 1)).as("t")))),
              x => x.getField("t")), lit(0.0), (a, b) => a + b).as("dcg"))
        per.select(col("query_id"), col("n_relevant"),
            when(col("n_relevant") === 0, lit(0.0))
              .otherwise(round(col("dcg") /
                aggregate(sequence(lit(1L), col("n_relevant")), lit(0.0),
                  (a, i) => a + lit(1.0) / log(2.0, i.cast("double") + 1)),
                6)).as("ndcg_at_5"))
          .orderBy("query_id")
      },
      Some("""WITH nrm AS (
          SELECT vec_id, label, embedding,
            SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
              AS nrm
          FROM embeddings),
        sc AS (
          SELECT a.vec_id AS query_id, a.label AS lq,
            b.vec_id AS id_b, b.label AS ln,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              / (a.nrm * b.nrm) AS cos
          FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 50 = 0),
        rk AS (
          SELECT query_id, lq, ln,
            ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, id_b) AS rk
          FROM sc),
        g AS (
          SELECT query_id, rk,
            CAST(lq = ln AS INT) AS gain
          FROM rk WHERE rk <= 5),
        per AS (
          SELECT query_id,
            CAST(SUM(gain) AS BIGINT) AS n_relevant,
            list_sum(list(CAST(gain AS DOUBLE) / log2(rk + 1)
              ORDER BY rk)) AS dcg
          FROM g GROUP BY query_id)
        SELECT query_id, n_relevant,
          CASE WHEN n_relevant = 0 THEN 0.0
            ELSE ROUND(dcg / list_sum(list_transform(
              range(1, n_relevant + 1), i -> 1.0 / log2(i + 1))), 6)
          END AS ndcg_at_5
        FROM per ORDER BY query_id""")),

    // ── s30: SQ8 calibration report — the step BEFORE s07/s18 ships:
    //    per-dim robust clip range (p01/p99, outlier-immune where
    //    min/max is not), 255-step quantization, and the per-dim
    //    reconstruction error that decides whether 8 bits suffice.
    //    One (dim)-keyed percentile agg broadcast back over the
    //    exploded stream; 64 output rows at any corpus size ────────────
    Q("s30_sq8_calibration",
      (s, dir) => {
        val px = Tables.embeddings(s, dir)
          .select(posexplode(col("embedding")).as(Seq("i0", "xf")))
          .select((col("i0") + 1).as("i"), col("xf").cast("double").as("x"))
        val bounds = px.groupBy("i").agg(
          expr("percentile(x, 0.01)").as("lo"),
          expr("percentile(x, 0.99)").as("hi"))
        val width = when(col("hi") === col("lo"), lit(1.0))
          .otherwise((col("hi") - col("lo")) / lit(255.0))
        val clip = least(greatest(col("x"), col("lo")), col("hi"))
        val deq = col("lo") + round((clip - col("lo")) / width) * width
        px.join(broadcast(bounds), Seq("i"))
          .select(col("i"), col("lo"), col("hi"),
            ((col("x") - deq) * (col("x") - deq)).as("se"),
            abs(col("x") - deq).as("ae"))
          .groupBy("i", "lo", "hi")
          .agg(round(avg(col("se")), 9).as("mse"),
            round(max(col("ae")), 6).as("max_abs_err"))
          .orderBy("i")
      },
      Some("""WITH px AS (
          SELECT i, CAST(embedding[i] AS DOUBLE) AS x
          FROM embeddings CROSS JOIN range(1, 65) t(i)),
        b AS (
          SELECT i, quantile_cont(x, 0.01) AS lo,
            quantile_cont(x, 0.99) AS hi
          FROM px GROUP BY i),
        j AS (
          SELECT px.i, b.lo, b.hi, px.x,
            CASE WHEN hi = lo THEN 1.0 ELSE (hi - lo) / 255.0 END AS w,
            LEAST(GREATEST(x, lo), hi) AS clip
          FROM px JOIN b ON b.i = px.i),
        d AS (
          SELECT i, lo, hi, x,
            lo + ROUND((clip - lo) / w) * w AS deq
          FROM j)
        SELECT i, lo, hi,
          ROUND(AVG((x - deq) * (x - deq)), 9) AS mse,
          ROUND(MAX(ABS(x - deq)), 6) AS max_abs_err
        FROM d GROUP BY i, lo, hi ORDER BY i""")),

    // ── s29: in-batch-negatives batch construction — label-striped
    //    batches for contrastive training (every other in-batch
    //    sample is a usable negative). Stripe key is pure integer
    //    arithmetic off one label-key window + a labels-sized
    //    broadcast; no global sort anywhere. Audit columns expose the
    //    short batches uneven label counts produce ──────────────────────
    Q("s29_inbatch_negatives",
      (s, dir) => {
        val b = graft.ops.SampleOps.stripedBatches(
          Tables.embeddings(s, dir).select("vec_id", "label"),
          "vec_id", "label", batchSize = 8)
        val audit = b.groupBy("batch_id")
          .agg(count(lit(1)).as("batch_n"),
            countDistinct(col("label")).as("batch_labels"))
        b.join(audit, Seq("batch_id"))
          .select("vec_id", "label", "batch_id", "slot",
            "batch_n", "batch_labels")
          .orderBy("vec_id")
      },
      Some("""WITH lr AS (
          SELECT label AS lbl,
            CAST(ROW_NUMBER() OVER (ORDER BY label) AS BIGINT) AS lrank
          FROM (SELECT DISTINCT label FROM embeddings)),
        nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS nl FROM lr),
        r AS (
          SELECT vec_id, label,
            CAST(ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id)
              AS BIGINT) AS rn
          FROM embeddings),
        st AS (
          SELECT vec_id, label, (rn - 1) * nl + lrank AS stripe
          FROM r JOIN lr ON lr.lbl = r.label CROSS JOIN nl),
        b AS (
          SELECT vec_id, label,
            CAST((stripe - 1) // 8 AS BIGINT) AS batch_id,
            CAST((stripe - 1) % 8 AS INT) AS slot
          FROM st),
        a AS (
          SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS batch_n,
            CAST(COUNT(DISTINCT label) AS BIGINT) AS batch_labels
          FROM b GROUP BY 1)
        SELECT b.vec_id, b.label, b.batch_id, b.slot,
          a.batch_n, a.batch_labels
        FROM b JOIN a USING (batch_id) ORDER BY vec_id""")),

    Q("s28_matryoshka_recall",
      (s, dir) => {
        // Matryoshka-style truncation audit (Kusupati et al. 2022,
        // arXiv:2205.13147): does retrieval by the first 16 dims
        // reproduce the full-64-dim top-5? Per query: overlap count +
        // recall@5. The production question behind shipping truncated
        // embeddings (4× memory/bandwidth cut in the ANN tier).
        val e = Tables.embeddings(s, dir)
        val isQ = col("vec_id") % 50 === 0
        val full = VectorOps.knnBruteForce(e.where(isQ), e,
            "vec_id", "embedding", 5)
          .select(col("id_a").as("query_id"), col("id_b").as("nb"))
        val etr = e.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("embedding"))
        val tr = VectorOps.knnBruteForce(etr.where(isQ), etr,
            "vec_id", "embedding", 5)
          .select(col("id_a").as("query_id"), col("id_b").as("nb"))
        val ov = full.join(tr, Seq("query_id", "nb"))
          .groupBy("query_id").agg(count(lit(1)).as("n_overlap"))
        e.where(isQ).select(col("vec_id").as("query_id"))
          .join(ov, Seq("query_id"), "left")
          .select(col("query_id"),
            coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
            round(coalesce(col("n_overlap"), lit(0L)).cast("double")
              / 5, 6).as("recall_at_5"))
          .orderBy("query_id")
      },
      Some("""WITH fsc AS (
          SELECT a.vec_id AS query_id, b.vec_id AS nb,
            list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(range(1, len(a.embedding) + 1),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
             * SQRT(list_sum(list_transform(range(1, len(b.embedding) + 1),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
            AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 50 = 0),
        frk AS (
          SELECT query_id, nb FROM (
            SELECT query_id, nb, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, nb) AS rk
            FROM fsc) WHERE rk <= 5),
        tsc AS (
          SELECT a.vec_id AS query_id, b.vec_id AS nb,
            list_sum(list_transform(range(1, 17),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (SQRT(list_sum(list_transform(range(1, 17),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
             * SQRT(list_sum(list_transform(range(1, 17),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))
            AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 50 = 0),
        trk AS (
          SELECT query_id, nb FROM (
            SELECT query_id, nb, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY cos DESC, nb) AS rk
            FROM tsc) WHERE rk <= 5),
        ov AS (
          SELECT f.query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap
          FROM frk f JOIN trk t
            ON t.query_id = f.query_id AND t.nb = f.nb
          GROUP BY f.query_id)
        SELECT q.vec_id AS query_id,
          COALESCE(ov.n_overlap, 0) AS n_overlap,
          ROUND(CAST(COALESCE(ov.n_overlap, 0) AS DOUBLE) / 5, 6)
            AS recall_at_5
        FROM embeddings q LEFT JOIN ov ON ov.query_id = q.vec_id
        WHERE q.vec_id % 50 = 0
        ORDER BY query_id""")),

    Q("s27_mmr_rerank",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        VectorOps.mmrRerank(e.where(col("vec_id") % 50 === 0), e,
          "vec_id", "embedding", kCand = 8, kSelect = 4, lambda = 0.7)
          .orderBy("query_id", "mmr_rank")
      },
      Some(mmrSql(kCand = 8, kSelect = 4))),

    // ── s33: cosine-similarity spectrum — the threshold-calibration
    //    card for semantic dedup (d24 is the MinHash twin): the
    //    distribution of pairwise cosines, histogrammed in 0.1-wide
    //    bins over [-1, 1]. Pairs come from a PORTABLE-hash bucket
    //    self-join — ~n²/B pairs at B buckets, so B is the SAMPLING
    //    knob: B = 16 is this oracle fixture's pinned value, and a
    //    production run scales B ∝ n to hold sampled-pair volume
    //    linear (the declared-fixture convention of s01's
    //    maxRightRows); the
    //    cosine doubles are bit-identical across engines (s01), so
    //    the bin floor is too ──────────────────────────────────────────
    Q("s33_cosine_spectrum",
      (s, dir) => {
        val e = Tables.embeddings(s, dir)
        val bkt = pmod(graft.functions.PortableHash.mdHash60(
          concat(lit("sp#"), col("vec_id").cast("string"))), lit(16L))
        val side = e.select(col("vec_id"), col("embedding"),
          bkt.as("bkt"), VectorOps.norm(col("embedding")).as("nrm"))
        val a = side.select(col("bkt"), col("vec_id").as("id_a"),
          col("embedding").as("va"), col("nrm").as("na"))
        val b = side.select(col("bkt"), col("vec_id").as("id_b"),
          col("embedding").as("vb"), col("nrm").as("nb"))
        val pairs = a.join(b, Seq("bkt"))
          .where(col("id_a") < col("id_b"))
          .select((VectorOps.dot(col("va"), col("vb"))
            / (col("na") * col("nb"))).as("cos"))
        val tot = pairs.agg(count(lit(1)).as("n_pairs_total"))
        pairs
          .select(least(floor((col("cos") + 1.0) / 0.1), lit(19.0))
            .cast("int").as("bin"))
          .groupBy("bin").agg(count(lit(1)).as("n_pairs"))
          .crossJoin(broadcast(tot))
          .select(col("bin"),
            round(col("bin") * 0.1 - 1.0, 1).as("bin_lo"),
            col("n_pairs"),
            round(col("n_pairs").cast("double") / col("n_pairs_total"), 6)
              .as("share"))
          .orderBy("bin")
      },
      Some("""WITH side AS (
          SELECT vec_id,
            ('0x' || substr(md5('sp#' || vec_id::VARCHAR), 1, 15))::BIGINT
              % 16 AS bkt,
            embedding,
            SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
              AS nrm
          FROM embeddings),
        pairs AS (
          SELECT list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
            / (a.nrm * b.nrm) AS cos
          FROM side a JOIN side b
            ON a.bkt = b.bkt AND a.vec_id < b.vec_id),
        tot AS (SELECT COUNT(*) AS n_pairs_total FROM pairs),
        bins AS (
          SELECT CAST(LEAST(FLOOR((cos + 1.0) / 0.1), 19.0) AS INT) AS bin,
            COUNT(*) AS n_pairs
          FROM pairs GROUP BY 1)
        SELECT bin, CAST(ROUND(bin * 0.1 - 1.0, 1) AS DOUBLE) AS bin_lo,
          CAST(n_pairs AS BIGINT) AS n_pairs,
          ROUND(CAST(n_pairs AS DOUBLE) / n_pairs_total, 6) AS share
        FROM bins CROSS JOIN tot ORDER BY bin""")),

    // ── s34: recall CURVE — s17's recall@k swept over k ∈ {1,3,5} in
    //    ONE pass: truth and index lists rank once to kMax, every
    //    cutoff reads the same matched join. The mean-recall-vs-k
    //    operating curve that picks k for a latency budget ──────────────
    Q("s34_recall_curve",
      (s, dir) => VectorOps.annRecallCurve(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, kMax = 5, probes = 2, sampleMod = 20,
        ks = Seq(1, 3, 5))
        .orderBy("k"),
      Some(s"""WITH $ivfKnnCtes,
        qs AS (SELECT vec_id FROM base
               WHERE ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT
                 % 20 = 0),
        tsc AS (
          SELECT qb.vec_id AS id_a, b.vec_id AS id_b,
            list_sum(list_transform(range(1, 65),
              i -> CAST(qb.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              / (qb.nrm * b.nrm) AS cos
          FROM qs q JOIN base qb ON qb.vec_id = q.vec_id
          CROSS JOIN base b
          WHERE b.vec_id <> q.vec_id),
        truth AS (
          SELECT id_a, id_b, rk_t FROM (
            SELECT id_a, id_b, ROW_NUMBER() OVER
              (PARTITION BY id_a ORDER BY cos DESC, id_b) AS rk_t
            FROM tsc)
          WHERE rk_t <= 5),
        ap AS (
          SELECT id_a, id_b, rk AS rk_a FROM ranked
          WHERE rk <= 5
            AND ('0x' || substr(md5(id_a::VARCHAR), 1, 15))::BIGINT % 20 = 0),
        matched AS (
          SELECT t.id_a, t.rk_t, ap.rk_a
          FROM truth t JOIN ap ON ap.id_a = t.id_a AND ap.id_b = t.id_b),
        nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries FROM qs),
        ks AS (SELECT * FROM (VALUES (1), (3), (5)) t(k)),
        hits AS (
          SELECT k, CAST(COUNT(m.rk_t) AS BIGINT) AS n_hits
          FROM ks LEFT JOIN matched m
            ON m.rk_t <= ks.k AND m.rk_a <= ks.k
          GROUP BY k)
        SELECT k, n_queries, n_hits,
          ROUND(CAST(n_hits AS DOUBLE) / (n_queries * k), 6)
            AS mean_recall
        FROM hits CROSS JOIN nq ORDER BY k""")))

  /** Unrolled greedy-MMR oracle for s27: candidate generation + one
    * CTE triple (remaining / max-sim / argmax) per selection round,
    * replaying [[graft.ops.VectorOps.mmrRerank]]'s exact arithmetic —
    * scores snapped to 6 dp BEFORE the argmax, 1−λ written as the
    * expression (1 - λ) so both engines run the same IEEE subtraction.
    */
  private def mmrSql(kCand: Int, kSelect: Int): String = {
    def cos(a: String, b: String) =
      s"""list_sum(list_transform(range(1, len($a.embedding) + 1),
              i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))
              / ($a.nrm * $b.nrm)"""
    val rounds = (2 to kSelect).map { r =>
      s"""rem$r AS (
          SELECT c.qid, c.cid, c.rel FROM cand c
          LEFT JOIN sel${r - 1} s ON s.qid = c.qid AND s.cid = c.cid
          WHERE s.cid IS NULL),
        ms$r AS (
          SELECT p.qid, p.cid, MAX(p.sim) AS maxsim
          FROM pr p JOIN sel${r - 1} s ON s.qid = p.qid AND s.cid = p.cid2
          GROUP BY p.qid, p.cid),
        pk$r AS (
          SELECT qid, cid, $r AS mmr_rank, rel, score FROM (
            SELECT r.qid, r.cid, r.rel,
              ROUND(0.7 * r.rel - (1 - 0.7) * m.maxsim, 6) AS score,
              ROW_NUMBER() OVER (PARTITION BY r.qid
                ORDER BY ROUND(0.7 * r.rel - (1 - 0.7) * m.maxsim, 6)
                  DESC, r.cid) AS rk
            FROM rem$r r JOIN ms$r m ON m.qid = r.qid AND m.cid = r.cid)
          WHERE rk = 1),
        sel$r AS (SELECT * FROM sel${r - 1} UNION ALL SELECT * FROM pk$r)"""
    }.mkString(",\n        ")
    s"""WITH nrm AS (
          SELECT vec_id, embedding,
            SQRT(list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))
              AS nrm
          FROM embeddings),
        sc AS (
          SELECT a.vec_id AS qid, b.vec_id AS cid,
            ${cos("a", "b")} AS rel
          FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
          WHERE a.vec_id % 50 = 0),
        cand AS (
          SELECT qid, cid, rel FROM (
            SELECT qid, cid, rel,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY rel DESC, cid) AS rk
            FROM sc) WHERE rk <= $kCand),
        pr AS (
          SELECT c1.qid, c1.cid, c2.cid AS cid2,
            ${cos("x", "y")} AS sim
          FROM cand c1 JOIN cand c2
            ON c1.qid = c2.qid AND c1.cid <> c2.cid
          JOIN nrm x ON x.vec_id = c1.cid
          JOIN nrm y ON y.vec_id = c2.cid),
        sel1 AS (
          SELECT qid, cid, 1 AS mmr_rank, rel, score FROM (
            SELECT qid, cid, rel, ROUND(0.7 * rel, 6) AS score,
              ROW_NUMBER() OVER (PARTITION BY qid
                ORDER BY ROUND(0.7 * rel, 6) DESC, cid) AS rk
            FROM cand) WHERE rk = 1),
        $rounds
        SELECT qid AS query_id, mmr_rank, cid AS vec_id,
          rel AS relevance, score AS mmr_score
        FROM sel$kSelect ORDER BY query_id, mmr_rank"""
  }
}
