package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.functions.PortableHash
import graft.sources.{FileSources, StreamingLake}

/** File-format connectors (§2.1 "sources" beyond parquet): JSON-lines
  * and RFC 4180 CSV read paths, proven LOSSLESS end-to-end by writing
  * the corpus out and reading it back (the m13/m15 own-encoder
  * fixture pattern applied to file formats), then census-aggregating
  * the round-tripped rows so the DuckDB oracle checks every byte that
  * matters (codepoint mass, portable content hashes, key range,
  * corrupt-line count) straight off the original parquet.
  *
  * Crafted rows (negative doc_ids, constructed IDENTICALLY in the
  * oracle SQL) force the hard cases a real drop contains regardless of
  * what the synthetic corpus happens to hold: embedded newlines,
  * embedded quotes, field separators, backslashes, combining-mark
  * non-ASCII, empty and NULL text.
  *
  * Reference behavior: faust's codec layer — bytes at the edge decode
  * through a declared schema, and undecodable payloads surface as
  * counted, typed errors instead of crashes
  * (`faust/serializers/codecs.py:1-60`, `faust/app/base.py` decode-
  * error policy); here that's PERMISSIVE mode + `_corrupt_record`.
  */
object SourceQueries {

  /** The five documents columns every round trip carries. */
  private def docCols(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))

  /** Crafted hard-case rows; `withNulls=false` drops the NULL/empty
    * text rows for the CSV path (CSV cannot represent the null/empty
    * distinction portably — the q139 census is null-insensitive
    * instead).
    */
  private def crafted(s: SparkSession, withNulls: Boolean): DataFrame = {
    import s.implicits._
    val base = Seq(
      (-1L, Option("line1\nline2"), "xx", "crafted", 11L),
      (-2L, Option("he said \"hi\", twice"), "xx", "crafted", 19L),
      (-3L, Option("back\\slash e\u0301"), "xx", "crafted", 13L),
      (-6L, Option(" padded "), "xx", "crafted", 8L))
    val extra = Seq(
      (-4L, Option(""), "xx", "crafted", 0L),
      (-5L, Option.empty[String], "xx", "crafted", 0L))
    (if (withNulls) base ++ extra else base)
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Shared crafted-rows CTE for the oracles (chr() construction —
    * byte-identical to the Scala literals above).
    */
  private def craftedSql(withNulls: Boolean): String = {
    val base =
      """(-1, 'line1' || chr(10) || 'line2', 'xx', 'crafted', 11),
        (-2, 'he said "hi", twice', 'xx', 'crafted', 19),
        (-3, 'back\slash e' || chr(769), 'xx', 'crafted', 13),
        (-6, ' padded ', 'xx', 'crafted', 8)"""
    val extra =
      """,
        (-4, '', 'xx', 'crafted', 0),
        (-5, NULL, 'xx', 'crafted', 0)"""
    s"""SELECT * FROM (VALUES
        $base${if (withNulls) extra else ""}
      ) t(doc_id, text, lang, source, n_chars)"""
  }

  val all: Seq[Q] = Seq(

    // ── q138: JSON-lines source — the SCALE drop format (newline-
    //    framed records split by byte range, so a 100 TB drop fans out
    //    with no coordination). Explicit schema (no inference scan),
    //    PERMISSIVE decode with a counted corrupt-record column (one
    //    malformed line injected on purpose), multi-part read. JSON is
    //    lossless for every value incl. NULL vs empty string ────────────
    Q("q138_json_source",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = true))
        // the malformed line breaks at the FIRST token, so PERMISSIVE
        // mode can't retain any partially-parsed field values
        val back = FileSources.jsonRoundTrip(all,
          rawExtraLines = Seq("""{BROKEN "doc_id": 999999}"""))
        val corrupt = col("_corrupt_record").isNotNull
        back.agg(
          sum(when(corrupt, 0L).otherwise(1L)).as("n_rows"),
          sum(when(corrupt, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(!corrupt && col("text").isNull, 1L).otherwise(0L))
            .as("n_null_text"),
          sum(when(!corrupt, length(col("text")).cast("long")))
            .as("sum_cp"),
          min(when(!corrupt, col("doc_id"))).as("min_id"),
          max(when(!corrupt, col("doc_id"))).as("max_id"),
          sum(when(!corrupt,
            PortableHash.mdHash60(col("text")) % 1000000000L)).as("h_sum"),
          countDistinct(when(!corrupt, col("lang"))).as("n_lang"))
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = true)}),
        u AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL SELECT doc_id, text, lang FROM crafted)
        SELECT COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS n_corrupt,
          CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_text,
          CAST(SUM(length(text)) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum,
          COUNT(DISTINCT lang) AS n_lang
        FROM u""")),

    // ── q139: RFC 4180 CSV source — header + every field quoted +
    //    doubled embedded quotes (escape = quote), the dialect every
    //    warehouse exports. `multiLine` carries embedded newlines (the
    //    documented non-splittable trade — keep multiline CSV drops in
    //    many files). The census is NULL-insensitive (coalesce) because
    //    CSV cannot portably distinguish NULL from '' ─────────────────────
    Q("q139_csv_source",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = false))
        val back = FileSources.csvRoundTrip(all)
        back.agg(
          count(lit(1)).as("n_rows"),
          sum(length(coalesce(col("text"), lit(""))).cast("long"))
            .as("sum_cp"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(PortableHash.mdHash60(coalesce(col("text"), lit("")))
            % 1000000000L).as("h_sum"),
          sum(col("n_chars")).as("sum_n_chars"))
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = false)}),
        u AS (
          SELECT doc_id, text, n_chars FROM documents
          UNION ALL SELECT doc_id, text, n_chars FROM crafted)
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(COALESCE(text, '')), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum,
          CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
        FROM u""")),

    // ── q140: ORC source — the columnar interchange format next to
    //    parquet: typed round trip (NULL vs '' preserved exactly, no
    //    string re-parse), splittable by stripe, predicate/column
    //    pushdown. Same census as q138 (sans corrupt — a columnar
    //    file either reads or fails its footer checksum) ─────────────────
    Q("q140_orc_source",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = true))
        val back = FileSources.orcRoundTrip(all)
        back.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
          sum(length(col("text")).cast("long")).as("sum_cp"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(PortableHash.mdHash60(col("text")) % 1000000000L).as("h_sum"),
          countDistinct(col("lang")).as("n_lang"))
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = true)}),
        u AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL SELECT doc_id, text, lang FROM crafted)
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_text,
          CAST(SUM(length(text)) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum,
          COUNT(DISTINCT lang) AS n_lang
        FROM u""")),

    // ── q141: Hive-partitioned lake + partition PRUNING — the single
    //    biggest 100 TB scan lever: documents land partitioned by
    //    lang (one directory per value), and the per-lang census
    //    below reads ONLY that directory's bytes (PartitionFilters,
    //    not a post-scan filter — plan-asserted in SourcesSpec). The
    //    census runs per lang so the oracle checks every partition's
    //    content landed in the right directory ──────────────────────────
    Q("q141_partitioned_source",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = false))
        val lake = FileSources.partitionedRoundTrip(all, "lang")
        // pruning contract, asserted inline at PLANNING time (no extra
        // scan): a single-lang slice must carry the predicate in
        // PartitionFilters (directory pruning), not as a post-scan
        // filter. The census itself groups over ALL langs with no
        // domain list — a new language in the corpus shows up in both
        // sides instead of being silently dropped (round-15 advice)
        FileSources.assertPartitionPruned(lake.where(col("lang") === "en"))
        lake.groupBy(col("lang"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(length(coalesce(col("text"), lit(""))).cast("long"))
              .as("sum_cp"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"),
            sum(PortableHash.mdHash60(coalesce(col("text"), lit("")))
              % 1000000000L).as("h_sum"))
          .orderBy("lang")
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = false)}),
        u AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL SELECT doc_id, text, lang FROM crafted)
        SELECT lang, COUNT(*) AS n_rows,
          CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(COALESCE(text, '')), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum
        FROM u
        GROUP BY lang ORDER BY lang""")),

    // ── q142: XML source — Spark 4's BUILT-IN XML reader (the
    //    third-party-feed format: sitemaps, RSS, SOAP exports), one
    //    <row> element per record, schema-enforced. Entity escaping
    //    carries the hard characters; NULL vs '' is not portable
    //    (absent vs empty element), so the census is null-insensitive
    //    like q139's ─────────────────────────────────────────────────────
    Q("q142_xml_source",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = false))
        val back = FileSources.xmlRoundTrip(all)
        back.agg(
          count(lit(1)).as("n_rows"),
          sum(length(coalesce(col("text"), lit(""))).cast("long"))
            .as("sum_cp"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(PortableHash.mdHash60(coalesce(col("text"), lit("")))
            % 1000000000L).as("h_sum"),
          countDistinct(col("lang")).as("n_lang"))
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = false)}),
        u AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL SELECT doc_id, text, lang FROM crafted)
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(COALESCE(text, '')), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum,
          COUNT(DISTINCT lang) AS n_lang
        FROM u""")),

    // ── q143: VARIANT codec — Spark 4's binary semi-structured type
    //    (schema-on-read without a declared schema: the lakehouse
    //    answer to "the drop's JSON payloads vary by record"). Each
    //    row's struct goes through to_json → parse_json (VARIANT) →
    //    typed variant_get extraction; the oracle is the IDENTITY on
    //    the original columns, so any encode/decode/path/cast defect
    //    breaks the hash. Missing paths must yield NULL (not error)
    //    via try_variant_get ──────────────────────────────────────────────
    Q("q143_variant_codec",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val v = parse_json(to_json(struct(col("lang"), col("n_chars"),
          col("source"))))
        docs.select(col("doc_id"), v.as("v"))
          .select(col("doc_id"),
            variant_get(col("v"), "$.lang", "string").as("lang"),
            variant_get(col("v"), "$.n_chars", "long").as("n_chars"),
            variant_get(col("v"), "$.source", "string").as("source"),
            try_variant_get(col("v"), "$.missing", "string").as("absent"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
          source, CAST(NULL AS VARCHAR) AS absent
        FROM documents ORDER BY doc_id""")),

    // ── q144: SCHEMA EVOLUTION — the standard lake lifecycle: an old
    //    generation of files (even doc_ids) lacks the n_chars column a
    //    later generation (odd doc_ids) added; a mergeSchema read
    //    unions the footers and old rows surface n_chars as NULL. The
    //    census checks exactly that: the column exists for every row,
    //    is NULL precisely on the old generation, and carries its
    //    original values on the new one ──────────────────────────────────
    Q("q144_schema_evolution",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val oldGen = docs.where(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("text"), col("lang"))
        val newGen = docs.where(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
        val lake = FileSources.schemaEvolvedLake(oldGen, newGen)
        lake.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("n_chars").isNull, 1L).otherwise(0L))
            .as("n_old_gen"),
          sum(col("n_chars")).as("sum_new_chars"),
          sum(length(coalesce(col("text"), lit(""))).cast("long"))
            .as("sum_cp"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN doc_id % 2 = 0 OR n_chars IS NULL
            THEN 1 ELSE 0 END) AS BIGINT) AS n_old_gen,
          CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
            AS sum_new_chars,
          CAST(SUM(length(COALESCE(text, ''))) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM documents""")),

    // ── q145: STREAMING lake ingestion — the landing-directory twin
    //    of topic consumption (`faust/topics.py:57-494`): the corpus
    //    arrives as TWO JSON-lines waves (7 files), a `readStream`
    //    with maxFilesPerTrigger=2 drains them AvailableNow in ≥4
    //    exactly-once micro-batches (asserted from the final batchId)
    //    into a `_spark_metadata`-committed parquet lake, and the
    //    census — q138's exact shape — runs on the lake's batch view.
    //    Restart/no-reprocess semantics are spec-proven in
    //    StreamingIngestSpec; here the oracle proves the DRAIN is
    //    byte-lossless end-to-end including the counted corrupt line ──────
    Q("q145_stream_ingest",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = true))
        val (landing, lake, ckpt) = StreamingLake.stageDirs()
        // wave 1: even + crafted ids, 3 parts + 1 injected bad line;
        // wave 2: odd ids, 3 parts — 7 files at 2/trigger → 4 batches
        StreamingLake.dropJsonWave(
          all.where(col("doc_id") % 2 === 0 || col("doc_id") < 0),
          landing, wave = 1, parts = 3,
          rawExtraLines = Seq("""{BROKEN "doc_id": 999999}"""))
        StreamingLake.dropJsonWave(
          all.where(col("doc_id") % 2 === 1 && col("doc_id") >= 0),
          landing, wave = 2, parts = 3)
        val q = StreamingLake.ingest(s, landing.toString, lake.toString,
          ckpt.toString, schema = all.schema, format = "json",
          maxFilesPerTrigger = 2)
        q.awaitTermination()
        require(q.lastProgress != null && q.lastProgress.batchId >= 2,
          "AvailableNow drain must take multiple admission-bounded batches")
        val back = StreamingLake.lakeView(s, lake.toString)
        val corrupt = col("_corrupt_record").isNotNull
        back.agg(
          sum(when(corrupt, 0L).otherwise(1L)).as("n_rows"),
          sum(when(corrupt, 1L).otherwise(0L)).as("n_corrupt"),
          sum(when(!corrupt && col("text").isNull, 1L).otherwise(0L))
            .as("n_null_text"),
          sum(when(!corrupt, length(col("text")).cast("long")))
            .as("sum_cp"),
          min(when(!corrupt, col("doc_id"))).as("min_id"),
          max(when(!corrupt, col("doc_id"))).as("max_id"),
          sum(when(!corrupt,
            PortableHash.mdHash60(col("text")) % 1000000000L)).as("h_sum"),
          countDistinct(when(!corrupt, col("lang"))).as("n_lang"))
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = true)}),
        u AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL SELECT doc_id, text, lang FROM crafted)
        SELECT COUNT(*) AS n_rows, CAST(1 AS BIGINT) AS n_corrupt,
          CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_text,
          CAST(SUM(length(text)) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum,
          COUNT(DISTINCT lang) AS n_lang
        FROM u""")),

    // ── q146: ZSTD parquet source — the production codec at 100 TB
    //    (the ratio/speed point both warehouses and lakes default to).
    //    zstd-jni inside the parquet writer (no native Hadoop codec),
    //    files stay splittable (per-page compression inside the
    //    container — the opposite of a raw .zst text drop, the same
    //    contrast SourcesSpec pins for gzip), and the round-trip
    //    helper asserts the codec landed from the `*.zstd.parquet`
    //    file names so a silent snappy fallback can't pass. Census =
    //    q140's typed shape (NULL vs '' preserved exactly) ────────────────
    Q("q146_zstd_source",
      (s, dir) => {
        val all = docCols(s, dir).unionByName(crafted(s, withNulls = true))
        val back = FileSources.parquetZstdRoundTrip(all)
        back.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_null_text"),
          sum(length(col("text")).cast("long")).as("sum_cp"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"),
          sum(PortableHash.mdHash60(col("text")) % 1000000000L).as("h_sum"),
          countDistinct(col("lang")).as("n_lang"))
      },
      Some(s"""WITH crafted AS (${craftedSql(withNulls = true)}),
        u AS (
          SELECT doc_id, text, lang FROM documents
          UNION ALL SELECT doc_id, text, lang FROM crafted)
        SELECT COUNT(*) AS n_rows,
          CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_null_text,
          CAST(SUM(length(text)) AS BIGINT) AS sum_cp,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(('0x' || substr(md5(text), 1, 15))::BIGINT
            % 1000000000) AS BIGINT) AS h_sum,
          COUNT(DISTINCT lang) AS n_lang
        FROM u""")),

    // ── q148: WebDataset shard FILES — the loader's ACTUAL input: the
    //    m21 shards written to disk as one REAL `.tar` file each
    //    (task-side writes, the object-store posture), the directory
    //    read back through Spark's binaryFile source (glob-pruned at
    //    listing), source/shard recovered from the FILE NAME, and the
    //    full per-shard census walked over the re-read bytes. Oracle =
    //    m21's oracle verbatim — one byte lost in write→list→read, or
    //    one mangled file name, breaks the hash ─────────────────────────
    Q("q148_wds_shard_files",
      (s, dir) => {
        val docs = graft.Tables.documents(s, dir)
          .select(col("source"), col("doc_id"), col("text"), col("lang"))
        val shards = graft.ops.TarOps.textToWdsShards(docs, byteBudget = 4096L)
        val files = FileSources.binaryRoundTrip(shards,
          concat(col("source"), lit("_"), col("shard_id"), lit(".tar")),
          col("tar"), glob = "*.tar")
        val parsed = files.select(
          regexp_extract(col("path"), "([^/]+)_(\\d+)\\.tar$", 1).as("source"),
          regexp_extract(col("path"), "([^/]+)_(\\d+)\\.tar$", 2)
            .cast("long").as("shard_id"),
          col("content").as("tar"))
        graft.ops.TarOps.wdsShardCensus(parsed)
          .orderBy("source", "shard_id")
      },
      Some("""WITH d AS (
          SELECT source, doc_id,
            strlen(COALESCE(text, '')) AS txt, strlen(lang) AS cls
          FROM documents),
        c AS (
          SELECT source, doc_id, txt, cls, txt + cls AS sb,
            COALESCE(SUM(txt + cls) OVER (PARTITION BY source
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          FROM d),
        sh AS (
          SELECT source, cum // 4096 AS shard_id, sb,
            1024 + ((txt + 511) // 512) * 512
                 + ((cls + 511) // 512) * 512 AS member_bytes
          FROM c)
        SELECT source, CAST(shard_id AS BIGINT) AS shard_id,
          CAST(COUNT(*) AS INT) AS n_samples,
          CAST(COUNT(*) * 2 AS INT) AS n_files,
          CAST(SUM(sb) AS BIGINT) AS payload_bytes,
          CAST(SUM(member_bytes) + 1024 AS BIGINT) AS shard_bytes
        FROM sh GROUP BY source, shard_id
        ORDER BY source, shard_id""")),

    // ── q149: MEDIA-DIRECTORY ingest — the multimodal source shape: a
    //    directory of individual audio files (own-encoded WAVs, one
    //    `.wav` per doc), listed and read by the binaryFile source,
    //    ids recovered from file names, every payload decoded with the
    //    repo's own codec. Oracle = m15's stat oracle verbatim
    //    (identity on the blobs), so the file round trip must be
    //    byte-lossless per file ──────────────────────────────────────────
    Q("q149_binary_source",
      (s, dir) => {
        val docs = graft.Tables.documents(s, dir)
          .select(col("doc_id"), col("text"))
        val wavs = graft.ops.WavOps.textToWavOwn(docs, "doc_id", "text")
        val files = FileSources.binaryRoundTrip(wavs,
          concat(col("id"), lit(".wav")), col("wav"), glob = "*.wav")
        graft.ops.WavOps.wavStats(
            files.select(
              regexp_extract(col("path"), "(\\d+)\\.wav$", 1)
                .cast("long").as("id"),
              col("content").as("wav")), "id", "wav")
          .select(col("id").as("doc_id"), col("sample_rate"),
            col("channels"), col("n_frames"), col("peak"), col("sumsq"),
            col("zero_crossings"))
          // pin: the 5 000-file binaryFile re-read + WAV decode would
          // otherwise run twice (the global sort's sampling pass —
          // Layout.pinBeforeSort scaladoc)
          .transform(graft.ops.Layout.pinBeforeSort(_, "doc_id"))
          .orderBy("doc_id")
      },
      Some("""WITH sm AS (
          SELECT doc_id AS id, c.c AS i,
            (CASE WHEN length(text) > 0 THEN
               ascii(substr(text, CAST((c.c * length(text)) // 64 + 1 AS INT), 1)) % 256
             ELSE 0 END - 128) * 256 AS s
          FROM documents CROSS JOIN range(64) c(c)),
        agg AS (
          SELECT id, MAX(ABS(s)) AS peak,
            SUM(CAST(s AS BIGINT) * s) AS sumsq
          FROM sm GROUP BY id),
        ch0 AS (SELECT id, i // 2 AS f, s FROM sm WHERE i % 2 = 0),
        zcs AS (
          SELECT id, s, LAG(s) OVER (PARTITION BY id ORDER BY f) AS ps
          FROM ch0),
        zc AS (
          SELECT id, CAST(COALESCE(SUM(CASE WHEN ps IS NOT NULL
              AND ((s < 0) != (ps < 0)) THEN 1 ELSE 0 END), 0) AS INT)
            AS zero_crossings
          FROM zcs GROUP BY id)
        SELECT agg.id AS doc_id, 8000 AS sample_rate, 2 AS channels,
          32 AS n_frames, CAST(agg.peak AS INT) AS peak,
          CAST(agg.sumsq AS BIGINT) AS sumsq, zc.zero_crossings
        FROM agg JOIN zc ON agg.id = zc.id
        ORDER BY doc_id"""))
  )
}
