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
        ORDER BY event_type, event_id"""))
  )
}
