package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.VectorOps

/** Similarity search over the `embeddings` table (`array<float>`). */
object VectorQueries {

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

    // ── LSH-bucketed ANN (scale path; deterministic hash-derived
    //    hyperplanes; rows-only check) ────────────────────────────────
    Q("s03_knn_lsh",
      (s, dir) => VectorOps.lshNearestNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding", numPlanes = 8, k = 3)
        .orderBy("id_a", "rk"),
      None),

    // ── IVF-bucketed ANN (deterministic pivots; rows-only) ──────────
    Q("s05_knn_ivf",
      (s, dir) => VectorOps.ivfNearestNeighbors(
        Tables.embeddings(s, dir), "vec_id", "embedding",
        nCells = 16, k = 3, probes = 2)
        .orderBy("id_a", "rk"),
      None),

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
        FROM embeddings GROUP BY label ORDER BY label"""))
  )
}
