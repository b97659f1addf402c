package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL operators for web-corpus curation — the provenance half of a
  * crawl-derived training-data pipeline (CCNet groups and filters by
  * source URL; Dolma and Common-Crawl-style curation dedup on
  * normalized URL and budget per registered domain).
  *
  * Everything here is a pure `Column` pipeline over
  * `org.apache.spark.sql.functions` — regexp extracts, array HOFs,
  * conditionals — so every operator stays inside whole-stage codegen
  * with zero UDFs. Scalar ops ([[parts]], [[normalize]],
  * [[registeredDomain]]) are narrow (no shuffle, filters push through
  * them); [[domainStats]] and [[dedupByUrl]] each cost exactly one
  * hash-shuffle on their (short-string) key.
  *
  * Reference scope note: faust has no URL surface (it is a stream
  * processor); this family belongs to the training-data-pipeline
  * extension surface alongside dedup/quality (SURVEY.md §2 extension
  * table), mirroring the URL keys the reference's event model carries
  * opaquely in payloads (faust/models typed fields).
  */
object UrlOps {

  /** Component extracts, RFC 3986 appendix-B style, each from the
    * ORIGINAL string so components can't bleed into one another
    * (the path extract skips `scheme://authority` positionally; query
    * and fragment are delimiter-anchored). Missing components are
    * NULL (not ''), so the contract is engine-independent — Spark's
    * `regexp_extract` returns '' on no-match, which we fold to NULL.
    *
    * Userinfo (`user:pass@host`) is stripped before the host/port
    * split (everything up to the last '@' of the authority), so
    * credentialed URLs parse to their true host instead of the
    * username; the userinfo itself is not emitted as a component.
    */
  private def nn(c: Column): Column = nullif(c, lit(""))

  def scheme(url: Column): Column =
    nn(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))

  private def authority(url: Column): Column =
    regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)

  // host:port = authority after the (optional) userinfo@
  private def hostPort(url: Column): Column =
    regexp_extract(authority(url), "([^@]*)$", 1)

  def host(url: Column): Column =
    nn(regexp_extract(hostPort(url), "^([^:]*)", 1))

  def port(url: Column): Column =
    nn(regexp_extract(hostPort(url), ":([0-9]+)$", 1)).cast("int")

  def path(url: Column): Column =
    nn(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1))

  // [^#?]* before the '?' anchors to the FIRST '?' and refuses to
  // cross a '#': a '?' inside the fragment (SPA routes) is fragment
  // content, not a query — without this, normalize() would invent a
  // query out of to-be-dropped fragment text
  def query(url: Column): Column =
    nn(regexp_extract(url, "^[^#?]*\\?([^#]*)", 1))

  def fragment(url: Column): Column =
    nn(regexp_extract(url, "#(.*)$", 1))

  /** All six components as named columns appended to `df`. */
  def parts(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumns(Map(
      "scheme" -> scheme(u), "host" -> host(u), "port" -> port(u),
      "path" -> path(u), "query" -> query(u), "fragment" -> fragment(u)))
  }

  /** Query params that carry no content identity — click/campaign
    * trackers. Dropping them is what lets the same page crawled from
    * two referrers dedup to one URL.
    */
  val TrackingParams = "^(utm_[^=]*|gclid|fbclid|ref)="

  /** Canonical URL — the standard crawl-dedup normalization:
    *   - scheme and host lowercased; leading `www.` dropped
    *   - default ports dropped (http:80, https:443); others kept
    *   - path: trailing '/' stripped, empty path becomes '/'
    *   - query: tracking params removed, the rest SORTED (param order
    *     is presentation, not identity), '?' dropped if none survive
    *   - fragment always dropped (client-side only)
    * Null-total: a null URL normalizes to null; a URL with no
    * `scheme://` (no match) yields null rather than a half-built
    * string, so malformed rows are routable instead of silently wrong.
    */
  def normalize(url: Column): Column = {
    val sch = lower(scheme(url))
    val hst = regexp_replace(lower(host(url)), "^www\\.", "")
    val prt = port(url)
    val keepPort = prt.isNotNull &&
      !((sch === "http" && prt === 80) || (sch === "https" && prt === 443))
    val pth = {
      val stripped = regexp_replace(coalesce(path(url), lit("")), "/+$", "")
      when(stripped === "", lit("/")).otherwise(stripped)
    }
    val q = {
      val kept = array_sort(filter(
        split(coalesce(query(url), lit("")), "&"),
        p => !(p.rlike(TrackingParams) || p === "")))
      when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
        .otherwise(lit(""))
    }
    when(sch.isNotNull && hst.isNotNull,
      concat(sch, lit("://"), hst,
        when(keepPort, concat(lit(":"), prt.cast("string"))).otherwise(lit("")),
        pth, q))
  }

  /** Robots.txt-style path rules with LONGEST-PREFIX-MATCH precedence
    * (the Google robots matcher semantics, REP RFC 9309 §2.2.2: the
    * most specific matching rule wins; an equal-specificity allow
    * beats disallow — ties sort allow-first so the allow rule is the
    * outermost `when` and wins). Rules are (pathPrefix, allow);
    * unmatched paths get `defaultAllow`. Compiles to ONE zero-shuffle
    * `when` chain — at 100 TB this is a scan-local scalar filter; a
    * per-host rules TABLE would instead broadcast-join on host and
    * apply the same chain per group.
    */
  def robotsClassify(pathCol: Column, rules: Seq[(String, Boolean)],
                     defaultAllow: Boolean = true): Seq[(String, Column)] = {
    require(rules.nonEmpty, "at least one rule")
    // foldRight makes the FIRST sorted rule the outermost branch, so
    // within an equal-length prefix tie allow (!a == false) sorts —
    // and therefore matches — first, per RFC 9309 §2.2.2.
    val sorted = rules.sortBy { case (p, a) => (-p.length, p, !a) }
    val matchedRule = sorted.foldRight(lit(null).cast("string")) {
      case ((p, _), els) => when(pathCol.startsWith(p), lit(p)).otherwise(els)
    }
    val allowed = sorted.foldRight(lit(defaultAllow)) {
      case ((p, a), els) => when(pathCol.startsWith(p), lit(a)).otherwise(els)
    }
    Seq("matched_rule" -> matchedRule, "allowed" -> allowed)
  }

  /** Two-level public suffixes the heuristic recognises. The real
    * Public Suffix List is a data file; at 100 TB you'd broadcast it
    * as a lookup map — the grouping shape is identical, so the
    * fixed in-expression set keeps this oracle-portable.
    */
  val TwoLevelTlds: Seq[String] = Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Registered (pay-level) domain of a host: last two labels, or
    * last three when the second-level label is a known two-level
    * public suffix (`example.co.uk` → `example.co.uk`, not `co.uk`).
    */
  def registeredDomain(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    // try_element_at, not element_at: ANSI mode (the session default)
    // throws on out-of-range indices, and a when() CONDITION is
    // evaluated even for rows its branch won't take — a single-label
    // host would crash a plain element_at(-2) here.
    def lbl(i: Int): Column = try_element_at(labels, lit(i))
    val last2 = concat_ws(".", lbl(-2), lbl(-1))
    val last3 = concat_ws(".", lbl(-3), lbl(-2), lbl(-1))
    when(n >= 3 && lbl(-2).isInCollection(TwoLevelTlds), last3)
      .otherwise(when(n >= 2, last2).otherwise(hostCol))
  }

  /** Per-registered-domain corpus profile: page count, distinct
    * normalized URLs, total chars, language spread. The domain-budget
    * signal (cap any one domain's share of the training mix).
    *
    * The two exact DISTINCT aggregates make Catalyst plan its Expand
    * rewrite — two shuffles (expanded key, then domain), every key a
    * short string. Exact counts are the point of a curation report;
    * at 100 TB swap `countDistinct` for `approx_count_distinct` to
    * fall back to one fully-partial shuffle at ~2% error.
    */
  def domainStats(df: DataFrame, urlCol: String, charsCol: String,
                  langCol: String): DataFrame = {
    // two-step projection = normalize once per row (see domainScorecard)
    df.select(normalize(col(urlCol)).as("url_norm"),
        col(charsCol).as("_chars"), col(langCol).as("_lang"))
      .select(registeredDomain(host(col("url_norm"))).as("domain"),
        col("url_norm"), col("_chars"), col("_lang"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_urls"),
        sum("_chars").as("total_chars"),
        countDistinct(col("_lang")).as("n_langs"))
  }

  /** Per-domain crawl-budget scorecard — [[domainStats]]' curation
    * companion: page count, distinct normalized URLs, the recrawl
    * duplication rate that implies (`1 - n_urls/n_docs`), and mean
    * content quality (any per-doc score column; t02's
    * `qualityColumns` in the u05 query). The decision table behind
    * per-domain caps and crawl scheduling: high dup_rate → waste,
    * low mean_quality → demote the domain in the mix.
    *
    * Same Expand-rewrite shape as [[domainStats]] (one exact DISTINCT
    * → 2 bounded shuffles on short string keys); mean quality rides
    * the same partial agg, round(6) snapping the order-dependent
    * double sum (cf. TextOps.unigramLmScore).
    */
  def domainScorecard(df: DataFrame, urlCol: String,
                      qualityCol: String): DataFrame = {
    // normalize ONCE per row in its own projection; the second select
    // derives the domain from the already-normalized string. Catalyst's
    // CollapseProject keeps the two apart (url_norm is referenced
    // twice and the normalize tree is not cheap), so the regex/HOF
    // chain runs once instead of once per consumer.
    df.select(normalize(col(urlCol)).as("url_norm"),
        col(qualityCol).as("_q"))
      .select(registeredDomain(host(col("url_norm"))).as("domain"),
        col("url_norm"), col("_q"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_urls"),
        round(avg("_q"), 6).as("mean_quality"))
      .withColumn("dup_rate",
        lit(1.0) - col("n_urls").cast("double") / col("n_docs").cast("double"))
  }

  /** URL-keyed exact dedup census, mirroring [[TextOps.exactDedup]]:
    * one row per distinct NORMALIZED url, smallest id wins. One
    * hash-shuffle on the normalized url. Rows whose URL fails to
    * normalize (null) are dropped — they'd otherwise all merge into
    * one spurious null group.
    */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    df.select(col(idCol), normalize(col(urlCol)).as("url_norm"))
      .where(col("url_norm").isNotNull)
      .groupBy("url_norm")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Per-domain crawl politeness schedule: rank each domain's frontier
    * by (priority desc, id asc) and pack at most `perSlot` fetches per
    * domain per time slot — the classic crawl-rate-limit assignment
    * (a polite crawler hits one host at a bounded rate; the slot index
    * is the earliest round the fetch may run).
    *
    * Scale shape: ONE shuffle on the registered domain; the per-domain
    * rank is inherently sequential (rate limiting is a per-host total
    * order) but each partition holds whole domains, so parallelism is
    * across domains — exactly how the fetch fleet consumes it. A
    * pathological mega-domain bounds its own partition at
    * rows-per-domain; that domain is equally the crawl's wall-clock
    * floor (perSlot per slot), so the skew mirrors the real schedule
    * rather than an artifact.
    */
  def politenessSchedule(df: DataFrame, urlCol: String, idCol: String,
                         priorityCol: String, perSlot: Int): DataFrame = {
    require(perSlot >= 1, "perSlot must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("domain").orderBy(col("_pri").desc, col("_id"))
    df.select(normalize(col(urlCol)).as("url_norm"),
        col(priorityCol).as("_pri"), col(idCol).as("_id"))
      .where(col("url_norm").isNotNull)
      .select(registeredDomain(host(col("url_norm"))).as("domain"),
        col("_pri"), col("_id"))
      .withColumn("fetch_rank", row_number().over(w))
      .select(col("domain"), col("fetch_rank"),
        expr(s"CAST((fetch_rank - 1) DIV $perSlot AS BIGINT)").as("slot"),
        col("_id").as("doc_id"))
  }

  /** Resolve redirect chains to their terminal URL by pointer
    * jumping — the crawl-pipeline step that collapses 301 maps before
    * canonicalization (a chain A→B→C must index under C; a redirect
    * LOOP must be flagged, not followed forever). Each round rewrites
    * every source's target to its target's target, so resolved depth
    * DOUBLES per round: `rounds` rounds resolve chains up to 2^rounds
    * hops with `rounds` self-joins of the (src, dst) map — never a
    * per-hop pass over a billion-URL map. After the rounds, a target
    * that is still itself a redirect source means the chain didn't
    * terminate in 2^rounds hops — a loop (or a deeper-than-budget
    * chain, indistinguishable by construction and equally unindexable):
    * `is_cycle = 1`, with `resolved` left at the (deterministic)
    * round-limit target.
    *
    * Output: (src, resolved, is_cycle) — one row per redirect SOURCE.
    */
  def resolveRedirects(redirects: DataFrame, srcCol: String,
                       dstCol: String, rounds: Int = 6): DataFrame = {
    require(rounds >= 1 && rounds <= 20, "rounds in [1,20]")
    var cur = redirects.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    var i = 0
    while (i < rounds) {
      val hop = cur.select(col("src").as("_hs"), col("dst").as("_hd"))
      cur = cur.join(hop, cur("dst") === col("_hs"), "left")
        .select(cur("src"), coalesce(col("_hd"), cur("dst")).as("dst"))
      i += 1
    }
    val sources = redirects.select(col(srcCol).as("_s")).distinct()
    cur.join(sources, cur("dst") === col("_s"), "left")
      .select(col("src"), col("dst").as("resolved"),
        col("_s").isNotNull.cast("int").as("is_cycle"))
      .orderBy("src")
  }
}
