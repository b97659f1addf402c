package graft.serving

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.{DataFrame, Row}

/** Refreshable in-memory point-lookup index over a table snapshot —
  * the worker-local-store parity the reference gets from RocksDB
  * (`/root/reference/faust/stores/rocksdb.py:135-478`) plus the
  * router's "the owning worker answers from local state"
  * (`faust/app/router.py:25-77`), collapsed to one driver-local map
  * because local-mode serving has exactly one worker. A real cluster
  * deployment would hold one such index per serving replica, each
  * refreshed from the same compacted changelog — the contract (serve
  * `table[k]` from memory, refresh per batch) is identical.
  *
  * `refresh()` re-runs the loader (typically
  * [[graft.streaming.ChangelogSink.readCompacted]]), collects the
  * snapshot into a `Map[keyString -> pre-rendered JSON body]`, and
  * atomically swaps it in — readers never see a partial index and
  * lookups between refreshes serve a consistent as-of view.
  * Staleness is bounded by the refresh cadence: wire `refresh()` into
  * the changelog writer's `foreachBatch` and the bound is one
  * micro-batch.
  *
  * The replicate-into-memory contract only makes sense for snapshots
  * that fit, so the row guard is part of the contract (the
  * [[graft.api.GlobalTable]] posture): a column-pruned probe counts
  * `limit(maxRows + 1)` rows FIRST and fails fast with a pointer to
  * the cold tier instead of OOMing mid-collect.
  */
final class SnapshotIndex(loader: () => DataFrame, keyCol: String,
                          maxRows: Long = 2_000_000L) {

  // (key -> JSON array of row objects, version, refreshedAtMillis)
  private val state =
    new AtomicReference[(Map[String, String], Long, Long)]((Map.empty, 0L, 0L))

  /** Rebuild the index from the loader; returns the new version.
    * Synchronized: concurrent refreshes would interleave the
    * read-bump-set version sequence (lookups stay lock-free on the
    * atomic reference).
    */
  def refresh(): Long = synchronized {
    val snap = loader()
    // probe limit clamped: a huge maxRows must not overflow the Int
    // limit() argument into a negative
    val probeCap = math.min(maxRows + 1, Int.MaxValue.toLong).toInt
    val probed = snap.select(keyCol).limit(probeCap).count()
    require(probed <= maxRows,
      s"SnapshotIndex($keyCol): snapshot exceeds $maxRows rows — " +
        "serve it from the pruned-scan cold tier (TableServer without " +
        "hot=true) or shard the serving layer")
    val keyIdx = snap.schema.fieldIndex(keyCol)
    // NULL keys are NOT indexed: the cold tier's equality predicate
    // never matches NULL, and stringifying would conflate a NULL key
    // with a real "null" string key — the two tiers must agree
    val grouped = snap.collect().filter(!_.isNullAt(keyIdx))
      .groupBy(_.get(keyIdx).toString)
    val m = grouped.map { case (k, rows) => k -> JsonRows.render(rows) }
    val (_, v0, _) = state.get()
    val v = v0 + 1
    state.set((m, v, System.currentTimeMillis()))
    v
  }

  /** Pure map hit — no Spark work on the request path. NULL keys are
    * never indexed (cold-tier equality parity), so they always miss.
    */
  def lookup(key: Any): Option[String] =
    if (key == null) None else state.get()._1.get(key.toString)

  /** Lookup + the (version, refreshedAtMillis) of the SAME snapshot
    * the body came from — one atomic read, so a concurrent refresh
    * can't label an old body with the new version.
    */
  def lookupWithMeta(key: Any): Option[(String, Long, Long)] = {
    if (key == null) return None
    val (m, v, at) = state.get()
    m.get(key.toString).map((_, v, at))
  }

  def version: Long = state.get()._2
  def refreshedAtMillis: Long = state.get()._3
  def size: Int = state.get()._1.size
}

/** Row → JSON rendering shared by the hot index (render-at-refresh)
  * and the cold pruned-scan tier (render-per-request).
  */
private[serving] object JsonRows {
  def render(rows: Array[Row]): String = {
    if (rows.isEmpty) return "[]"
    val fields = rows.head.schema.fieldNames
    rows.map { r =>
      fields.zipWithIndex.map { case (f, i) =>
        val v = r.get(i) match {
          case null => "null"
          case n: Number => n.toString
          case b: Boolean => b.toString
          case other => "\"" + other.toString
            .replace("\\", "\\\\").replace("\"", "\\\"") + "\""
        }
        s""""$f":$v"""
      }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
  }
}
