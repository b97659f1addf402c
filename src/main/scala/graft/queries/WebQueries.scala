package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.UrlOps

/** URL / web-provenance queries (u-family) over the documents corpus.
  *
  * The synthetic corpus carries no URL column, so each query first
  * derives a deterministic URL from (doc_id, source, lang) — pure
  * integer/string arithmetic replicated verbatim in the DuckDB oracle
  * CTE, so both engines parse/normalize the exact same strings. The
  * synthesis deliberately exercises every normalization rule: mixed
  * case, `www.`, default and non-default ports, trailing slashes,
  * tracking params, unsorted params, fragments, and a two-level-TLD
  * host, with enough modulus collisions that normalization actually
  * merges distinct raw URLs (u04's reason to exist).
  */
object WebQueries {

  /** Spark-side URL synthesis — mirror of [[urlCte]]. */
  private def urlFixture(df: DataFrame): DataFrame = {
    val d = col("doc_id")
    val scheme = when(d % 4 === 0, lit("http")).when(d % 4 === 1, lit("https"))
      .when(d % 4 === 2, lit("HTTP")).otherwise(lit("https"))
    // three host shapes: per-source registrable domain (case-folded),
    // two-level-TLD subdomain (all sources merge to example.co.uk),
    // and a cdn. subdomain that merges to example.org
    val host = when(d % 3 === 0, concat(lit("WWW."), col("source"), lit(".COM")))
      .when(d % 3 === 1, concat(col("source"), lit(".example.co.uk")))
      .otherwise(concat(lit("cdn."), col("source"), lit(".Example.ORG")))
    val port = when(d % 5 === 0, lit(":80")).when(d % 5 === 1, lit(":443"))
      .when(d % 5 === 2, lit(":8080")).otherwise(lit(""))
    val path = concat(lit("/docs/"), col("lang"), lit("/"), (d % 100).cast("string"),
      when(d % 6 === 0, lit("/")).otherwise(lit("")))
    val query = when(d % 6 === 0, concat(lit("?utm_source=feed&id="), (d % 50).cast("string")))
      .when(d % 6 === 1, lit("?b=2&a=1&utm_campaign=x"))
      .when(d % 6 === 2, lit("?gclid=abc"))
      .when(d % 6 === 3, concat(lit("?id="), (d % 50).cast("string")))
      .otherwise(lit(""))
    val fragment = when(d % 7 === 0, lit("#sec1")).otherwise(lit(""))
    df.withColumn("url", concat(scheme, lit("://"), host, port, path, query, fragment))
  }

  /** DuckDB-side URL synthesis — mirror of [[urlFixture]]. */
  private val urlCte: String =
    """u AS (
      SELECT doc_id, lang, source, n_chars,
        (CASE doc_id % 4 WHEN 0 THEN 'http' WHEN 1 THEN 'https'
          WHEN 2 THEN 'HTTP' ELSE 'https' END)
        || '://'
        || (CASE doc_id % 3
          WHEN 0 THEN 'WWW.' || source || '.COM'
          WHEN 1 THEN source || '.example.co.uk'
          ELSE 'cdn.' || source || '.Example.ORG' END)
        || (CASE doc_id % 5 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
          WHEN 2 THEN ':8080' ELSE '' END)
        || '/docs/' || lang || '/' || CAST(doc_id % 100 AS VARCHAR)
        || (CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END)
        || (CASE doc_id % 6
          WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id % 50 AS VARCHAR)
          WHEN 1 THEN '?b=2&a=1&utm_campaign=x'
          WHEN 2 THEN '?gclid=abc'
          WHEN 3 THEN '?id=' || CAST(doc_id % 50 AS VARCHAR)
          ELSE '' END)
        || (CASE WHEN doc_id % 7 = 0 THEN '#sec1' ELSE '' END) AS url
      FROM documents)"""

  /** DuckDB normalization chain shared by u02/u03/u04 — mirror of
    * [[UrlOps.normalize]] piece by piece (NULLIF folds Spark's
    * ''-on-no-match to NULL identically on both engines).
    */
  private val normCte: String =
    """p AS (
      SELECT doc_id, lang, n_chars, url,
        lower(NULLIF(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '')) AS sch,
        regexp_replace(lower(NULLIF(regexp_extract(
          regexp_extract(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
            '([^@]*)$', 1),
          '^([^:]*)', 1), '')), '^www\.', '') AS hst,
        CAST(NULLIF(regexp_extract(
          regexp_extract(
            regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
            '([^@]*)$', 1),
          ':([0-9]+)$', 1), '') AS INTEGER) AS prt,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS pth,
        regexp_extract(url, '^[^#?]*\?([^#]*)', 1) AS qry
      FROM u),
    n AS (
      SELECT doc_id, lang, n_chars, url, hst,
        CASE WHEN sch IS NOT NULL AND hst IS NOT NULL THEN
          sch || '://' || hst
          || (CASE WHEN prt IS NOT NULL
                AND NOT ((sch = 'http' AND prt = 80) OR (sch = 'https' AND prt = 443))
              THEN ':' || CAST(prt AS VARCHAR) ELSE '' END)
          || (CASE WHEN regexp_replace(pth, '/+$', '') = '' THEN '/'
              ELSE regexp_replace(pth, '/+$', '') END)
          || (CASE WHEN len(keep_params) > 0
              THEN '?' || array_to_string(keep_params, '&') ELSE '' END)
        END AS url_norm
      FROM (SELECT *,
        list_sort(list_filter(string_split(qry, '&'),
          x -> NOT (regexp_matches(x, '^(utm_[^=]*|gclid|fbclid|ref)=') OR x = '')))
          AS keep_params
        FROM p))"""

  val all: Seq[Q] = Seq(

    // ── RFC 3986 component split, null-normalized ───────────────────
    Q("u01_url_parse",
      (s, dir) => {
        val df = UrlOps.parts(urlFixture(Tables.documents(s, dir)), "url")
        // port as STRING, not int: the driver's oracle path goes through
        // pandas, where a nullable INTEGER degrades to float64 and can
        // never hash-match Spark's int column
        df.select(col("doc_id"), col("url"), col("scheme"), col("host"),
            col("port").cast("string").as("port"), col("path"),
            col("query").as("url_query"), col("fragment").as("url_fragment"))
          .orderBy("doc_id")
      },
      Some(s"""WITH $urlCte
        SELECT doc_id, url,
          NULLIF(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1), '') AS scheme,
          NULLIF(regexp_extract(
            regexp_extract(
              regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
              '([^@]*)$$', 1),
            '^([^:]*)', 1), '') AS host,
          NULLIF(regexp_extract(
            regexp_extract(
              regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
              '([^@]*)$$', 1),
            ':([0-9]+)$$', 1), '') AS port,
          NULLIF(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '') AS path,
          NULLIF(regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '') AS url_query,
          NULLIF(regexp_extract(url, '#(.*)$$', 1), '') AS url_fragment
        FROM u ORDER BY doc_id""")),

    // ── canonical URL (crawl-dedup normalization) ───────────────────
    Q("u02_url_normalize",
      (s, dir) => urlFixture(Tables.documents(s, dir))
        .select(col("doc_id"), col("url"), UrlOps.normalize(col("url")).as("url_norm"))
        .orderBy("doc_id"),
      Some(s"""WITH $urlCte, $normCte
        SELECT doc_id, url, url_norm FROM n ORDER BY doc_id""")),

    // ── registered-domain corpus profile (domain-budget signal) ─────
    Q("u03_domain_stats",
      (s, dir) => UrlOps.domainStats(urlFixture(Tables.documents(s, dir)),
          "url", "n_chars", "lang")
        .orderBy("domain"),
      Some(s"""WITH $urlCte, $normCte,
        d AS (SELECT *,
          string_split(hst, '.') AS ls FROM n),
        g AS (SELECT *,
          CASE WHEN len(ls) >= 3 AND ls[-2] IN ('co','com','org','net','ac','gov','edu')
            THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
          ELSE hst END AS domain
          FROM d)
        SELECT domain, COUNT(*) AS n_docs,
          COUNT(DISTINCT url_norm) AS n_urls,
          CAST(SUM(n_chars) AS BIGINT) AS total_chars,
          COUNT(DISTINCT lang) AS n_langs
        FROM g GROUP BY domain ORDER BY domain""")),

    // ── per-domain crawl-budget scorecard: u03's stats + the dup rate
    //    normalization implies + t02's quality score, one decision
    //    table per registered domain (cap/demote/recrawl). Text joins
    //    back by doc_id in the oracle (the shared norm CTE carries
    //    only provenance columns). ────────────────────────────────────
    Q("u05_domain_scorecard",
      (s, dir) => {
        val docs = urlFixture(Tables.documents(s, dir))
        val qcol = graft.ops.TextOps
          .qualityColumns(col("text"), Seq("the", "a", "of", "to"))
          .toMap.apply("quality_score")
        UrlOps.domainScorecard(docs.withColumn("_qs", qcol), "url", "_qs")
          .orderBy("domain")
      },
      Some(s"""WITH $urlCte, $normCte,
        d AS (SELECT *, string_split(hst, '.') AS ls FROM n),
        g AS (SELECT *,
          CASE WHEN len(ls) >= 3 AND ls[-2] IN ('co','com','org','net','ac','gov','edu')
            THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
          ELSE hst END AS domain
          FROM d),
        q AS (SELECT doc_id,
          (CAST(LENGTH(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
            / len(string_split(text, ' ')))
          * (1.0 - CAST(len(list_filter(string_split(text, ' '),
              t -> t IN ('the', 'a', 'of', 'to'))) AS DOUBLE)
            / len(string_split(text, ' '))) AS qs
          FROM documents)
        SELECT domain, COUNT(*) AS n_docs,
          COUNT(DISTINCT url_norm) AS n_urls,
          ROUND(AVG(qs), 6) AS mean_quality,
          1.0 - CAST(COUNT(DISTINCT url_norm) AS DOUBLE) / COUNT(*) AS dup_rate
        FROM g JOIN q USING (doc_id)
        GROUP BY domain ORDER BY domain""")),

    // ── URL-keyed dedup census (normalization merges raw variants) ──
    Q("u04_url_dedup",
      (s, dir) => UrlOps.dedupByUrl(urlFixture(Tables.documents(s, dir)),
          "doc_id", "url")
        .orderBy("url_norm"),
      Some(s"""WITH $urlCte, $normCte
        SELECT url_norm, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        FROM n WHERE url_norm IS NOT NULL
        GROUP BY url_norm ORDER BY url_norm""")),

    // ── weighted PageRank over a synthetic source→source link graph:
    //    crawl-frontier prioritization (faust has no analog; this is
    //    the 100 TB domain-ranking loop). Each doc contributes one
    //    link source→f(doc_id); parallel links pre-aggregate into
    //    weights. 3 power rounds, ranks snapped to 9 dp per round so
    //    the oracle replays the iteration bit-for-bit. ───────────────
    Q("u06_domain_pagerank",
      (s, dir) => {
        val edges = Tables.documents(s, dir)
          .groupBy(col("source").as("u"),
            concat(lit("src"), ((col("doc_id") * 7 + 3) % 20)
              .cast("string")).as("v"))
          .agg(count(lit(1)).cast("double").as("w"))
        graft.ops.GraphOps.pageRank(edges, iters = 3)
          .withColumnRenamed("rank", "pr")
          .orderBy("node")
      },
      Some(pageRankSql(iters = 3))),

    // ── u07: HITS hubs & authorities over the same synthetic link
    //    graph as u06 — crawl-seed scoring (hubs) + canonical-source
    //    scoring (authorities) from one power iteration ──────────────
    Q("u07_hits",
      (s, dir) => {
        val edges = Tables.documents(s, dir)
          .groupBy(col("source").as("u"),
            concat(lit("src"), ((col("doc_id") * 7 + 3) % 20)
              .cast("string")).as("v"))
          .agg(count(lit(1)).cast("double").as("w"))
        graft.ops.GraphOps.hits(edges, iters = 3)
          .orderBy("node")
      },
      Some(hitsSql(iters = 3))),

    // ── u08: robots-rules path gating — longest-prefix-match
    //    allow/deny over the crawl's URL paths (REP RFC 9309 matcher
    //    semantics). One zero-shuffle when-chain; per-host rule tables
    //    broadcast-join the same chain at scale ─────────────────────────
    Q("u08_robots_rules",
      (s, dir) => {
        val withPath = urlFixture(Tables.documents(s, dir))
          .select(col("doc_id"), UrlOps.path(col("url")).as("path"))
        val cols = UrlOps.robotsClassify(col("path"), Seq(
          "/docs/de/1" -> true,
          "/docs/de" -> false,
          "/docs/fr/2" -> false))
          .map { case (n, c) => c.as(n) }
        withPath.select(col("doc_id") +: col("path") +: cols: _*)
          .orderBy("doc_id")
      },
      Some(s"""WITH $urlCte,
        pth AS (
          SELECT doc_id,
            NULLIF(regexp_extract(url,
              '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '') AS path
          FROM u)
        SELECT doc_id, path,
          CASE WHEN starts_with(path, '/docs/de/1') THEN '/docs/de/1'
               WHEN starts_with(path, '/docs/fr/2') THEN '/docs/fr/2'
               WHEN starts_with(path, '/docs/de') THEN '/docs/de'
               ELSE NULL END AS matched_rule,
          CASE WHEN starts_with(path, '/docs/de/1') THEN TRUE
               WHEN starts_with(path, '/docs/fr/2') THEN FALSE
               WHEN starts_with(path, '/docs/de') THEN FALSE
               ELSE TRUE END AS allowed
        FROM pth ORDER BY doc_id""")),

    // ── u09: crawl-frontier priority — u06's PageRank composed with
    //    an exponential freshness decay (half-life 7 days): the score
    //    a recrawl scheduler sorts its frontier by. Age is synthesized
    //    per node; pow's sub-ulp engine differences vanish under the
    //    9-dp snap ──────────────────────────────────────────────────────
    Q("u09_crawl_priority",
      (s, dir) => {
        val edges = Tables.documents(s, dir)
          .groupBy(col("source").as("u"),
            concat(lit("src"), ((col("doc_id") * 7 + 3) % 20)
              .cast("string")).as("v"))
          .agg(count(lit(1)).cast("double").as("w"))
        val pr = graft.ops.GraphOps.pageRank(edges, iters = 3)
          .withColumnRenamed("rank", "pr")
        val age = (substring(col("node"), 4, 10).cast("int") % 30)
          .as("age_days")
        pr.select(col("node"), col("pr"), age)
          .withColumn("priority",
            round(col("pr") * pow(lit(0.5),
              col("age_days").cast("double") / lit(7.0)), 9))
          .orderBy(col("priority").desc, col("node"))
      },
      Some(pageRankCtes(iters = 3) + """,
        aged AS (
          SELECT node, pr,
            CAST(substr(node, 4) AS INT) % 30 AS age_days
          FROM r3)
        SELECT node, pr, age_days,
          ROUND(pr * POWER(0.5e0, CAST(age_days AS DOUBLE) / 7.0e0), 9)
            AS priority
        FROM aged ORDER BY priority DESC, node""")),

    // ── u10: query-parameter census — which URL params the crawl
    //    carries, how often, and which are tracking noise: the audit
    //    that justifies (and extends) u02's strip list. Params-many
    //    rollup + one scalar ────────────────────────────────────────────
    Q("u10_param_census",
      (s, dir) => {
        val urls = urlFixture(Tables.documents(s, dir))
        val q = UrlOps.query(col("url"))
        val params = urls
          .select(explode(split(coalesce(q, lit("")), "&")).as("p"))
          .where(col("p") =!= "")
          .select(split(col("p"), "=").getItem(0).as("param"))
        val tot = params.agg(count(lit(1)).as("n_total"))
        params.groupBy("param").agg(count(lit(1)).as("n"))
          .crossJoin(broadcast(tot))
          .select(col("param"), col("n"),
            col("param").rlike("^(utm_.*|gclid|fbclid|ref)$")
              .cast("int").as("is_tracking"),
            round(col("n").cast("double") / col("n_total"), 6).as("share"))
          .orderBy("param")
      },
      Some(s"""WITH $urlCte,
        qp AS (
          SELECT NULLIF(regexp_extract(url, '^[^#?]*\\?([^#]*)', 1), '')
            AS url_query
          FROM u),
        pr AS (
          SELECT UNNEST(string_split(COALESCE(url_query, ''), '&')) AS p
          FROM qp),
        nm AS (
          SELECT string_split(p, '=')[1] AS param FROM pr WHERE p <> ''),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM nm)
        SELECT param, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(regexp_matches(param, '^(utm_.*|gclid|fbclid|ref)$$') AS INT)
            AS is_tracking,
          ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(n_total), 6) AS share
        FROM nm CROSS JOIN t GROUP BY param ORDER BY param""")),

    // ── u11: crawl politeness schedule — each registered domain's
    //    frontier ranked by (size desc, doc_id) and packed 2 fetches
    //    per domain per slot: the rate-limit assignment a polite
    //    fetch fleet executes. One domain-key shuffle; parallelism is
    //    across domains, matching the fleet's own concurrency model ─────
    Q("u11_politeness_plan",
      (s, dir) => UrlOps.politenessSchedule(
        urlFixture(Tables.documents(s, dir)),
        "url", "doc_id", "n_chars", perSlot = 2)
        .orderBy("domain", "fetch_rank"),
      Some(s"""WITH $urlCte, $normCte,
        d AS (SELECT *, string_split(hst, '.') AS ls FROM n),
        g AS (SELECT doc_id, n_chars,
          CASE WHEN len(ls) >= 3 AND ls[-2] IN ('co','com','org','net','ac','gov','edu')
            THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
          WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
          ELSE hst END AS domain
          FROM d),
        r AS (
          SELECT domain, doc_id,
            CAST(ROW_NUMBER() OVER (PARTITION BY domain
              ORDER BY n_chars DESC, doc_id) AS INT) AS fetch_rank
          FROM g)
        SELECT domain, fetch_rank,
          CAST((fetch_rank - 1) // 2 AS BIGINT) AS slot, doc_id
        FROM r ORDER BY domain, fetch_rank""")),

    // ── u12: domain communities — synchronous label propagation over
    //    u06's link graph (3 fixed rounds, smallest-label ties): the
    //    site-cluster detector next to PageRank's importance and
    //    HITS' roles. Deterministic by construction, so the oracle
    //    unrolls the same rounds; community size joined back ────────────
    Q("u12_domain_communities",
      (s, dir) => {
        val edges = Tables.documents(s, dir)
          .groupBy(col("source").as("u"),
            concat(lit("src"), ((col("doc_id") * 7 + 3) % 20)
              .cast("string")).as("v"))
          .agg(count(lit(1)).cast("double").as("w"))
        val com = graft.ops.GraphOps.labelPropagation(edges, rounds = 3)
        val sz = com.groupBy("lbl")
          .agg(count(lit(1)).as("community_size"))
        com.join(sz, Seq("lbl"))
          .select(col("node"), col("lbl").as("community"),
            col("community_size"))
          .orderBy("node")
      },
      Some {
        val roundCtes = (1 to 3).map { r =>
          s"""s$r AS (
              SELECT und.u, l.lbl AS nl, SUM(w) AS s
              FROM und JOIN l${r - 1} l ON l.node = und.v
              GROUP BY 1, 2),
            l$r AS (
              SELECT u AS node, nl AS lbl FROM (
                SELECT u, nl, ROW_NUMBER() OVER (PARTITION BY u
                  ORDER BY s DESC, nl) AS rk
                FROM s$r)
              WHERE rk = 1)"""
        }.mkString(",\n            ")
        s"""WITH ed0 AS (
            SELECT source AS u,
              'src' || ((doc_id * 7 + 3) % 20)::VARCHAR AS v,
              CAST(COUNT(*) AS DOUBLE) AS w
            FROM documents GROUP BY 1, 2),
          und AS (
            SELECT u, v, SUM(w) AS w FROM (
              SELECT u, v, w FROM ed0
              UNION ALL SELECT v AS u, u AS v, w FROM ed0)
            GROUP BY 1, 2),
          l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und),
          $roundCtes,
          sz AS (SELECT lbl, CAST(COUNT(*) AS BIGINT) AS community_size
                 FROM l3 GROUP BY 1)
        SELECT l3.node, l3.lbl AS community, sz.community_size
        FROM l3 JOIN sz ON sz.lbl = l3.lbl
        ORDER BY node"""
      }),

    // ── u13: triangle census + local clustering coefficient over the
    //    u06 link graph (undirected) — link-farm / tight-clique
    //    detection for crawl quality. Degree-ORIENTED wedge join: every
    //    edge directs low→high (degree, node) rank, wedges enumerate
    //    only at the low endpoint, the closing edge is a semi-join —
    //    orientation caps out-degree at O(√m) so no hub explodes a
    //    partition at web scale. Exact integer counts; the coefficient
    //    is the only division ──────────────────────────────────────────
    Q("u13_triangle_census",
      (s, dir) => {
        // cohort target (doc_id div 20): NOT constant per source
        // (source ≡ doc_id mod 20, so any linear-in-doc_id target
        // collapses to one edge per source — a triangle-free
        // matching); the mod-7 doc filter thins the otherwise-complete
        // K20 to a mid-density graph with varied clustering
        val edges = Tables.documents(s, dir)
          .where(expr("doc_id % 7 < 2"))
          .select(col("source").as("x"),
            concat(lit("src"), expr("(doc_id div 20) % 20")
              .cast("string")).as("y"))
        graft.ops.GraphOps.triangleStats(edges, "x", "y")
      },
      Some("""WITH e0 AS (
          SELECT source AS x,
            'src' || ((doc_id // 20) % 20)::VARCHAR AS y
          FROM documents WHERE doc_id % 7 < 2),
        und AS (SELECT DISTINCT LEAST(x, y) AS a, GREATEST(x, y) AS b
                FROM e0 WHERE x <> y),
        deg AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
                  SELECT a AS node FROM und
                  UNION ALL SELECT b AS node FROM und)
                GROUP BY 1),
        o AS (SELECT
                CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
                  THEN a ELSE b END AS u,
                CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
                  THEN b ELSE a END AS v,
                CASE WHEN d1.deg < d2.deg OR (d1.deg = d2.deg AND a < b)
                  THEN d2.deg ELSE d1.deg END AS dv
              FROM und
              JOIN deg d1 ON d1.node = a
              JOIN deg d2 ON d2.node = b),
        tri AS (SELECT o1.u, o1.v, o2.v AS w
                FROM o o1 JOIN o o2 ON o1.u = o2.u
                WHERE (o1.dv < o2.dv OR (o1.dv = o2.dv AND o1.v < o2.v))
                  AND EXISTS (SELECT 1 FROM o oc
                              WHERE oc.u = o1.v AND oc.v = o2.v)),
        pn AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
                 SELECT u AS node FROM tri
                 UNION ALL SELECT v AS node FROM tri
                 UNION ALL SELECT w AS node FROM tri)
               GROUP BY 1)
        SELECT deg.node, deg.deg AS degree,
          COALESCE(pn.n_triangles, CAST(0 AS BIGINT)) AS n_triangles,
          CASE WHEN deg.deg >= 2 THEN
            ROUND(2.0 * COALESCE(pn.n_triangles, 0) / (deg.deg * (deg.deg - 1)), 6)
          ELSE 0.0 END AS clustering
        FROM deg LEFT JOIN pn USING (node)
        ORDER BY node""")),

    // ── u14: redirect-chain resolution — collapse 301 maps to their
    //    terminal URL before canonicalization, flagging loops. Pointer
    //    jumping: each round rewrites every target to its target's
    //    target, so 6 self-joins resolve chains up to 2^6 hops — never
    //    a per-hop pass over a billion-URL map. A target still in the
    //    source set after the rounds = a loop (or over-budget chain),
    //    flagged not followed. Fixture: every third doc redirects
    //    u{id} → u{id div 2} (log-depth chains into terminals) plus a
    //    planted 2-cycle ────────────────────────────────────────────────
    Q("u14_redirect_resolution",
      (s, dir) => {
        import s.implicits._
        val base = Tables.documents(s, dir)
          .where(expr("doc_id % 3 = 0"))
          .select(concat(lit("u"), col("doc_id").cast("string")).as("src"),
            concat(lit("u"), expr("doc_id div 2").cast("string")).as("dst"))
        val cyc = Seq(("cyc_a", "cyc_b"), ("cyc_b", "cyc_a"))
          .toDF("src", "dst")
        graft.ops.UrlOps.resolveRedirects(base.union(cyc), "src", "dst",
          rounds = 6)
      },
      Some {
        val roundCtes = (1 to 6).map { i =>
          s"""r$i AS (SELECT s.src, COALESCE(h.dst, s.dst) AS dst
             |  FROM r${i - 1} s LEFT JOIN r${i - 1} h ON s.dst = h.src)"""
            .stripMargin
        }.mkString(",\n        ")
        s"""WITH r0 AS (
          SELECT 'u' || doc_id::VARCHAR AS src,
                 'u' || (doc_id // 2)::VARCHAR AS dst
          FROM documents WHERE doc_id % 3 = 0
          UNION ALL SELECT 'cyc_a', 'cyc_b'
          UNION ALL SELECT 'cyc_b', 'cyc_a'),
        $roundCtes,
        srcs AS (SELECT DISTINCT src AS s FROM r0)
        SELECT r6.src, r6.dst AS resolved,
          CAST(srcs.s IS NOT NULL AS INT) AS is_cycle
        FROM r6 LEFT JOIN srcs ON r6.dst = srcs.s
        ORDER BY src"""
      })
  )

  /** Unrolled power-iteration oracle for u06 — one CTE per round,
    * replaying [[graft.ops.GraphOps.pageRank]]'s exact arithmetic:
    * snapped ranks in, ROUND(..., 9) out, dangling mass folded
    * uniformly (zero on this fixture, but the term is kept so the
    * oracle stays faithful to the operator's semantics).
    */
  private def pageRankSql(iters: Int): String =
    pageRankCtes(iters) + s"\n        SELECT node, pr FROM r$iters ORDER BY node"

  /** u06's replayed power iteration, ending OPEN after `r{iters}` so
    * callers (u06 select, u09 freshness compose) append their tails.
    */
  /** Package-visible generator: unrolled PageRank CTE chain over any
    * caller-supplied CTE prefix that ends defining `ed(u, v, w)` —
    * t47 (TextRank) reuses u06's exact round replay on its own
    * co-occurrence graph.
    */
  private[queries] def pageRankCtesFor(edSql: String, iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"r${i - 1}"
      s"""dg$i AS (
          SELECT COALESCE(SUM(pr), 0.0) AS dm FROM $prev
          WHERE node NOT IN (SELECT u FROM ed)),
        r$i AS (
          SELECT nd.node,
            ROUND((1.0 - 0.85) / cnt.n
              + 0.85 * (COALESCE(m.m, 0.0) + dg$i.dm / cnt.n), 9) AS pr
          FROM nd CROSS JOIN cnt CROSS JOIN dg$i
          LEFT JOIN (
            SELECT f.v AS node, SUM(r.pr * f.f) AS m
            FROM fr f JOIN $prev r ON r.node = f.u
            GROUP BY f.v) m USING (node))"""
    }.mkString(",\n        ")
    s"""WITH $edSql,
        ow AS (SELECT u, SUM(w) AS ow FROM ed GROUP BY u),
        fr AS (
          SELECT ed.u, ed.v,
            CAST(ed.w AS DOUBLE) / CAST(ow.ow AS DOUBLE) AS f
          FROM ed JOIN ow USING (u)),
        nd AS (
          SELECT DISTINCT node FROM (
            SELECT u AS node FROM ed UNION ALL SELECT v FROM ed) t),
        cnt AS (SELECT COUNT(*) AS n FROM nd),
        r0 AS (
          SELECT node, ROUND(1.0 / cnt.n, 9) AS pr
          FROM nd CROSS JOIN cnt),
        $rounds"""
  }

  private def pageRankCtes(iters: Int): String =
    pageRankCtesFor("""ed AS (
          SELECT source AS u,
            'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS v,
            COUNT(*) AS w
          FROM documents GROUP BY 1, 2)""", iters)

  /** Unrolled HITS oracle for u07 — replays
    * [[graft.ops.GraphOps.hits]]'s exact half-steps: snapped raw
    * propagation (9 dp), L1 total, snapped normalized scores. Four
    * CTEs per round (auth raw/total/norm, then hub raw/total/norm on
    * the freshly-normalized authorities).
    */
  private def hitsSql(iters: Int): String = {
    val rounds = (1 to iters).map { i =>
      val prev = s"h${i - 1}"
      s"""ar$i AS (
          SELECT nd.node, ROUND(COALESCE(f.s, 0.0), 9) AS raw
          FROM nd LEFT JOIN (
            SELECT e.v AS node, SUM(h.hub * e.w) AS s
            FROM ed e JOIN $prev h ON h.node = e.u GROUP BY e.v) f
          USING (node)),
        at$i AS (SELECT SUM(raw) AS t FROM ar$i),
        a$i AS (
          SELECT node, ROUND(raw / at$i.t, 9) AS auth
          FROM ar$i CROSS JOIN at$i),
        hr$i AS (
          SELECT nd.node, ROUND(COALESCE(f.s, 0.0), 9) AS raw
          FROM nd LEFT JOIN (
            SELECT e.u AS node, SUM(a.auth * e.w) AS s
            FROM ed e JOIN a$i a ON a.node = e.v GROUP BY e.u) f
          USING (node)),
        ht$i AS (SELECT SUM(raw) AS t FROM hr$i),
        h$i AS (
          SELECT node, ROUND(raw / ht$i.t, 9) AS hub
          FROM hr$i CROSS JOIN ht$i)"""
    }.mkString(",\n        ")
    s"""WITH ed AS (
          SELECT source AS u,
            'src' || CAST((doc_id * 7 + 3) % 20 AS VARCHAR) AS v,
            CAST(COUNT(*) AS DOUBLE) AS w
          FROM documents GROUP BY 1, 2),
        nd AS (
          SELECT DISTINCT node FROM (
            SELECT u AS node FROM ed UNION ALL SELECT v FROM ed) t),
        cnt AS (SELECT COUNT(*) AS n FROM nd),
        h0 AS (
          SELECT node, ROUND(1.0 / cnt.n, 9) AS hub
          FROM nd CROSS JOIN cnt),
        $rounds
        SELECT h.node, h.hub, a.auth
        FROM h$iters h JOIN a$iters a USING (node) ORDER BY node"""
  }
}
