package graft.queries

/** DuckDB SQL recomputation of Spark's XXH64 variant — the piece that
  * turns the xx-flavor queries (d08) from triangulated to hash-EXACT.
  *
  * Spark's `xxhash64` is NOT reference xxHash for lengths that are not
  * multiples of 8: `XXH64.hashUnsafeBytes` (spark-catalyst, verified
  * against the 4.1.2 bytecode) passes the FULL length to
  * `hashBytesByWords` — which adds the full length and consumes 8-byte
  * words while `offset <= end-8` — and then reprocesses the final
  * `length % 8` bytes as a 4-byte chunk + byte tail. The SQL here
  * replicates exactly that, so `xxhash64(CAST(i AS INT), tok)` =
  * `hashUnsafeBytes(tokUtf8, hashInt(i, 42))` is reproduced bit-for-bit
  * (validated against `pyspark` ground truth and the full sf0.01 d08
  * output — 26,349/26,349 rows equal).
  *
  * Arithmetic model: DuckDB BIGINT/UBIGINT multiplication raises on
  * overflow, so all wrapping arithmetic runs in HUGEINT mod 2^64.
  * Every multiply in XXH64 is by a constant prime, so the wrapping
  * product splits into constant 32-bit halves:
  * `a*p mod 2^64 = (a*lo + ((a*hi) mod 2^32) * 2^32) mod 2^64`, with
  * every intermediate < 2^97 — safely inside HUGEINT.
  *
  * Preconditions (naturally true for the whitespace tokenizer, and
  * ASSERTED inside the generated CTEs via `error()` so a violation
  * fails loudly instead of producing a silently wrong oracle): tokens
  * are ASCII (`ord` = UTF-8 byte) and at most 8 bytes, so only the
  * short tail path is generated; long keys are non-negative. A wider
  * corpus would need the 32-byte stripe loop added in the same style.
  */
object XxHashSql {

  private val P1 = BigInt("9E3779B185EBCA87", 16)
  private val P2 = BigInt("C2B2AE3D27D4EB4F", 16)
  private val P3 = BigInt("165667B19E3779F9", 16)
  private val P4 = BigInt("85EBCA77C2B2AE63", 16)
  private val P5 = BigInt("27D4EB2F165667C5", 16)
  private val M64 = BigInt(1) << 64

  /** a * constant-prime, wrapped to 64 bits (a is HUGEINT in [0,2^64)). */
  private def wmul(a: String, p: BigInt): String = {
    val hi = p >> 32; val lo = p & 0xFFFFFFFFL
    s"((($a) * ${lo}::HUGEINT + ((($a) * ${hi}::HUGEINT) % 4294967296::HUGEINT)" +
      s" * 4294967296::HUGEINT) % $M64::HUGEINT)"
  }

  private def rotl(x: String, r: Int): String =
    s"(((($x) * ${BigInt(1) << r}::HUGEINT) % $M64::HUGEINT" +
      s" + (($x) // ${BigInt(1) << (64 - r)}::HUGEINT)) % $M64::HUGEINT)"

  private def xor(a: String, b: String): String =
    s"(xor(($a)::UBIGINT, ($b)::UBIGINT)::HUGEINT)"

  private def shr(x: String, r: Int): String =
    s"(($x) // ${BigInt(1) << r}::HUGEINT)"

  private def add(a: String, b: String): String =
    s"((($a) + ($b)) % $M64::HUGEINT)"

  /** fmix chain as CTE stages keyed on column `h`, carrying `keep`. */
  private def fmixCtes(prefix: String, from: String, keep: String): String =
    s"""${prefix}1 AS (SELECT $keep, ${xor("h", shr("h", 33))} AS h FROM $from),
       |${prefix}2 AS (SELECT $keep, ${wmul("h", P2)} AS h FROM ${prefix}1),
       |${prefix}3 AS (SELECT $keep, ${xor("h", shr("h", 29))} AS h FROM ${prefix}2),
       |${prefix}4 AS (SELECT $keep, ${wmul("h", P3)} AS h FROM ${prefix}3),
       |${prefix}5 AS (SELECT $keep, ${xor("h", shr("h", 32))} AS h FROM ${prefix}4)""".stripMargin

  /** CTE block computing `tok_hash(tok, i, hv)` — the signed Spark
    * `xxhash64(CAST(i AS INT), tok)` for every (distinct token,
    * permutation i in [0, k)) pair. Input CTE `dtok(tok)` must exist.
    */
  private def tokHashCtes(k: Int): String = {
    val hashIntInit = (BigInt(42) + P5 + 4) % M64
    // precondition gate: only the <=8-byte ASCII tail path is
    // generated (the corpus tokenizer guarantees it today); a corpus /
    // tokenizer change that violates it must fail HERE with a clear
    // message, not surface as an opaque d08/q53 hash mismatch. A wider
    // corpus needs the 32-byte stripe loop added in the same style.
    s"""dtok_ck AS (SELECT CASE
       |  WHEN strlen(tok) > 8 OR length(tok) <> strlen(tok)
       |  THEN error('XxHashSql precondition violated: token not ASCII or >8 bytes: ' || tok)
       |  ELSE tok END AS tok FROM dtok),
       |perm AS (SELECT dtok_ck.tok, t.i FROM dtok_ck CROSS JOIN range($k) t(i)),
       |s1 AS (SELECT tok, i, ${add(wmul(rotl(xor(s"$hashIntInit::HUGEINT",
                 wmul("i::HUGEINT", P1)), 23), P2), s"$P3::HUGEINT")} AS h FROM perm),
       |${fmixCtes("f", "s1", "tok, i")},
       |seed AS (SELECT tok, i, h AS seed FROM f5),
       |tb AS (SELECT tok, i, seed, strlen(tok) AS len,
       |  list_transform(range(1, strlen(tok)+1), j -> ord(substr(tok, j, 1))) AS bs
       |  FROM seed),
       |w8 AS (SELECT tok, i, len, bs, seed,
       |  CASE WHEN len = 8 THEN
       |    (bs[1]::HUGEINT + bs[2]::HUGEINT*256 + bs[3]::HUGEINT*65536
       |     + bs[4]::HUGEINT*16777216 + bs[5]::HUGEINT*4294967296
       |     + bs[6]::HUGEINT*1099511627776 + bs[7]::HUGEINT*281474976710656
       |     + bs[8]::HUGEINT*72057594037927936)
       |  ELSE 0::HUGEINT END AS k1,
       |  CASE WHEN len >= 4 AND len < 8 THEN
       |    (bs[1]::HUGEINT + bs[2]::HUGEINT*256 + bs[3]::HUGEINT*65536
       |     + bs[4]::HUGEINT*16777216)
       |  ELSE 0::HUGEINT END AS k4
       |  FROM tb),
       |h0 AS (SELECT tok, i, len, bs, k1, k4,
       |  ${add(add("seed", s"$P5::HUGEINT"), "len::HUGEINT")} AS h FROM w8),
       |h2 AS (SELECT tok, i, len, bs, k4,
       |  CASE WHEN len = 8 THEN ${xor("h", wmul(rotl(wmul("k1", P2), 31), P1))}
       |  ELSE h END AS h FROM h0),
       |h3 AS (SELECT tok, i, len, bs, k4,
       |  CASE WHEN len = 8 THEN ${add(wmul(rotl("h", 27), P1), s"$P4::HUGEINT")}
       |  ELSE h END AS h FROM h2),
       |h4 AS (SELECT tok, i, len, bs,
       |  CASE WHEN len >= 4 AND len < 8 THEN ${xor("h", wmul("k4", P1))}
       |  ELSE h END AS h FROM h3),
       |h5 AS (SELECT tok, i, len, bs,
       |  CASE WHEN len >= 4 AND len < 8
       |  THEN ${add(wmul(rotl("h", 23), P2), s"$P3::HUGEINT")}
       |  ELSE h END AS h FROM h4),
       |tail AS (SELECT tok, i, len, h,
       |  CASE WHEN len < 8 THEN bs[CASE WHEN len >= 4 THEN 5 ELSE 1 END : len]
       |  ELSE [] END AS tl FROM h5),
       |h6 AS (SELECT tok, i,
       |  CASE WHEN len(tl) > 0 THEN
       |    list_reduce(list_prepend(h, list_transform(tl, b -> b::HUGEINT)),
       |      (acc, b) -> ${wmul(rotl(xor("acc", wmul("b", P5)), 11), P1)})
       |  ELSE h END AS h FROM tail),
       |${fmixCtes("g", "h6", "tok, i")},
       |tok_hash AS (SELECT tok, i,
       |  (h - CASE WHEN h >= 9223372036854775808::HUGEINT
       |     THEN $M64::HUGEINT ELSE 0::HUGEINT END)::BIGINT AS hv
       |  FROM g5)""".stripMargin
  }

  /** CTE block hashing a non-negative BIGINT column with Spark's
    * `xxhash64(k)` = `XXH64.hashLong(k, 42)`. Input CTE `keys` must
    * provide `k` (already HUGEINT) plus the `keep` columns; output CTE
    * `key_hash(keep..., h)` with h in [0, 2^64).
    */
  private def hashLongCtes(keep: String): String = {
    val init = (BigInt(42) + P5 + 8) % M64
    // precondition gate: the mod-2^64 model below assumes k >= 0 (a
    // negative BIGINT would need the two's-complement image instead);
    // error() out loudly rather than produce a silently wrong oracle
    s"""l0 AS (SELECT $keep, CASE WHEN k < 0
       |  THEN error('XxHashSql precondition violated: negative key')
       |  ELSE k END AS k FROM keys),
       |l1 AS (SELECT $keep, ${xor(s"$init::HUGEINT",
            wmul(rotl(wmul("k", P2), 31), P1))} AS h FROM l0),
       |l2 AS (SELECT $keep, ${add(wmul(rotl("h", 27), P1), s"$P4::HUGEINT")} AS h FROM l1),
       |${fmixCtes("lf", "l2", keep)},
       |key_hash AS (SELECT $keep, h FROM lf5)""".stripMargin
  }

  /** Oracle for [[graft.ops.SketchOps.hyperLogLog]]: recomputes the
    * portable-HLL estimate bit-for-bit — same hash, same exact scaled
    * register sum (HUGEINT, order-free), same IEEE ops in the same
    * textual order, raw-range estimator only (no libm calls).
    */
  def hllPortableOracle(table: String, keyCol: String, p: Int = 8): String = {
    val m = 1 << p
    val w = 64 - p
    val regDiv = BigInt(1) << w
    val scale = BigInt(1) << (w + 1)
    s"""WITH keys AS (SELECT $keyCol::HUGEINT AS k FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hashLongCtes("k")},
       |hreg AS (SELECT (h // $regDiv::HUGEINT)::BIGINT AS reg,
       |                (h % $regDiv::HUGEINT)::UBIGINT AS v FROM key_hash),
       |rk AS (SELECT reg,
       |  MAX(CASE WHEN v = 0 THEN ${w + 1}
       |      ELSE ${w + 1} - length(bin(v)) END) AS mj
       |  FROM hreg GROUP BY reg),
       |s AS (SELECT SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
       |             COUNT(*) AS cnt FROM rk)
       |SELECT round(0.7213 / (1 + 1.079 / $m.0) * $m.0 * $m.0 /
       |  (((sp + ($m - cnt) * $scale::HUGEINT))::DOUBLE / $scale.0), 4)
       |  AS hll_est
       |FROM s""".stripMargin
  }

  /** Grouped twin of [[hllPortableOracle]]: one estimate per value of
    * `groupCol` — the q25 `groupBy(event_type)` shape, hash-EXACT.
    */
  def hllPortableGroupedOracle(table: String, groupCol: String,
                               keyCol: String, p: Int = 8): String = {
    val m = 1 << p
    val w = 64 - p
    val regDiv = BigInt(1) << w
    val scale = BigInt(1) << (w + 1)
    s"""WITH keys AS (SELECT $groupCol AS g, $keyCol::HUGEINT AS k FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hashLongCtes("g")},
       |hreg AS (SELECT g, (h // $regDiv::HUGEINT)::BIGINT AS reg,
       |                (h % $regDiv::HUGEINT)::UBIGINT AS v FROM key_hash),
       |rk AS (SELECT g, reg,
       |  MAX(CASE WHEN v = 0 THEN ${w + 1}
       |      ELSE ${w + 1} - length(bin(v)) END) AS mj
       |  FROM hreg GROUP BY g, reg),
       |s AS (SELECT g, SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
       |             COUNT(*) AS cnt FROM rk GROUP BY g)
       |SELECT g AS $groupCol,
       |  round(0.7213 / (1 + 1.079 / $m.0) * $m.0 * $m.0 /
       |  (((sp + ($m - cnt) * $scale::HUGEINT))::DOUBLE / $scale.0), 4)
       |  AS hll_est
       |FROM s ORDER BY g""".stripMargin
  }

  /** Sliding-window twin of [[hllPortableGroupedOracle]] for
    * `SketchOps.hllSlidingDistinct`: per-bucket registers once, then
    * each target bucket merges the trailing `windowSize` buckets'
    * registers via MAX (register max IS set union) and folds the
    * identical bit-parity estimate; the exact leg replays the
    * windowed COUNT(DISTINCT) for the error report.
    */
  def hllSlidingWindowOracle(table: String, groupExpr: String,
                             keyCol: String, windowSize: Int,
                             p: Int = 8): String = {
    val m = 1 << p
    val w = 64 - p
    val regDiv = BigInt(1) << w
    val scale = BigInt(1) << (w + 1)
    s"""WITH keys AS (SELECT $groupExpr AS g, $keyCol::HUGEINT AS k FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hashLongCtes("g")},
       |hreg AS (SELECT g, (h // $regDiv::HUGEINT)::BIGINT AS reg,
       |                (h % $regDiv::HUGEINT)::UBIGINT AS v FROM key_hash),
       |rk AS (SELECT g, reg,
       |  MAX(CASE WHEN v = 0 THEN ${w + 1}
       |      ELSE ${w + 1} - length(bin(v)) END) AS mj
       |  FROM hreg GROUP BY g, reg),
       |tg AS (SELECT DISTINCT g AS t FROM keys),
       |merged AS (SELECT tg.t, rk.reg, MAX(rk.mj) AS mj
       |  FROM tg JOIN rk ON rk.g BETWEEN tg.t - ${windowSize - 1} AND tg.t
       |  GROUP BY tg.t, rk.reg),
       |s AS (SELECT t, SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
       |             COUNT(*) AS cnt FROM merged GROUP BY t),
       |ex AS (SELECT tg.t, CAST(COUNT(DISTINCT k) AS BIGINT)
       |    AS exact_distinct
       |  FROM tg JOIN keys ON keys.g BETWEEN tg.t - ${windowSize - 1}
       |    AND tg.t
       |  GROUP BY tg.t)
       |SELECT s.t AS bucket, ex.exact_distinct,
       |  round(0.7213 / (1 + 1.079 / $m.0) * $m.0 * $m.0 /
       |  (((sp + ($m - cnt) * $scale::HUGEINT))::DOUBLE / $scale.0), 4)
       |  AS hll_est
       |FROM s JOIN ex ON ex.t = s.t ORDER BY bucket""".stripMargin
  }

  /** Stickiness twin of [[hllSlidingWindowOracle]] for
    * `SketchOps.hllStickiness`: per-day registers once, DAU = per-day
    * fold, WAU/MAU = trailing 7/28-day register-MAX merges with the
    * identical bit-parity fold, then the round-6 DAU/WAU and DAU/MAU
    * ratios — every arithmetic step mirrors the Spark side exactly so
    * the approximate report is hash-EXACT cross-engine.
    */
  def hllStickinessOracle(table: String, dayExpr: String,
                          keyCol: String, p: Int = 8): String = {
    val m = 1 << p
    val w = 64 - p
    val regDiv = BigInt(1) << w
    val scale = BigInt(1) << (w + 1)
    def fold(of: String) =
      s"""round(0.7213 / (1 + 1.079 / $m.0) * $m.0 * $m.0 /
         |  ((($of.sp + ($m - $of.cnt) * $scale::HUGEINT))::DOUBLE / $scale.0), 4)""".stripMargin
    def slide(win: Int, mcte: String, scte: String) =
      s"""$mcte AS (SELECT tg.t, rk.reg, MAX(rk.mj) AS mj
         |  FROM tg JOIN rk ON rk.g BETWEEN tg.t - ${win - 1} AND tg.t
         |  GROUP BY tg.t, rk.reg),
         |$scte AS (SELECT t, SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
         |             COUNT(*) AS cnt FROM $mcte GROUP BY t)""".stripMargin
    s"""WITH keys AS (SELECT $dayExpr AS g, $keyCol::HUGEINT AS k FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hashLongCtes("g")},
       |hreg AS (SELECT g, (h // $regDiv::HUGEINT)::BIGINT AS reg,
       |                (h % $regDiv::HUGEINT)::UBIGINT AS v FROM key_hash),
       |rk AS (SELECT g, reg,
       |  MAX(CASE WHEN v = 0 THEN ${w + 1}
       |      ELSE ${w + 1} - length(bin(v)) END) AS mj
       |  FROM hreg GROUP BY g, reg),
       |tg AS (SELECT DISTINCT g AS t FROM keys),
       |sd AS (SELECT g AS t, SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
       |             COUNT(*) AS cnt FROM rk GROUP BY g),
       |dau AS (SELECT t, ${fold("sd")} AS dau_est FROM sd),
       |${slide(7, "m7", "s7")},
       |wau AS (SELECT t, ${fold("s7")} AS wau_est FROM s7),
       |${slide(28, "m28", "s28")},
       |mau AS (SELECT t, ${fold("s28")} AS mau_est FROM s28)
       |SELECT dau.t AS day, dau_est, wau_est, mau_est,
       |  round(dau_est / wau_est, 6) AS stickiness_7,
       |  round(dau_est / mau_est, 6) AS stickiness_28
       |FROM dau JOIN wau ON wau.t = dau.t JOIN mau ON mau.t = dau.t
       |ORDER BY day""".stripMargin
  }

  /** Pairwise inclusion–exclusion twin of [[hllPortableGroupedOracle]]
    * for `SketchOps.hllOverlap`: per-slice registers once, slice
    * pairs (a < b), union registers via MAX over both slices' rows,
    * then the identical bit-parity fold for |A|, |B|, |A∪B| and
    * est_common = round(est_a + est_b − est_union, 4).
    */
  def hllOverlapOracle(table: String, groupCol: String, keyCol: String,
                       p: Int = 8): String = {
    val m = 1 << p
    val w = 64 - p
    val regDiv = BigInt(1) << w
    val scale = BigInt(1) << (w + 1)
    def fold(of: String) =
      s"""round(0.7213 / (1 + 1.079 / $m.0) * $m.0 * $m.0 /
         |  ((($of.sp + ($m - $of.cnt) * $scale::HUGEINT))::DOUBLE / $scale.0), 4)""".stripMargin
    s"""WITH keys AS (SELECT $groupCol AS g, $keyCol::HUGEINT AS k FROM $table
       |  WHERE $keyCol IS NOT NULL),
       |${hashLongCtes("g")},
       |hreg AS (SELECT g, (h // $regDiv::HUGEINT)::BIGINT AS reg,
       |                (h % $regDiv::HUGEINT)::UBIGINT AS v FROM key_hash),
       |rk AS (SELECT g, reg,
       |  MAX(CASE WHEN v = 0 THEN ${w + 1}
       |      ELSE ${w + 1} - length(bin(v)) END) AS mj
       |  FROM hreg GROUP BY g, reg),
       |sg AS (SELECT g, SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
       |              COUNT(*) AS cnt FROM rk GROUP BY g),
       |est AS (SELECT g, ${fold("sg")} AS e FROM sg),
       |sl AS (SELECT DISTINCT g FROM rk),
       |pr AS (SELECT a.g AS src_a, b.g AS src_b
       |       FROM sl a JOIN sl b ON a.g < b.g),
       |ur AS (SELECT src_a, src_b, reg, MAX(mj) AS mj FROM (
       |    SELECT pr.src_a, pr.src_b, rk.reg, rk.mj
       |    FROM pr JOIN rk ON rk.g = pr.src_a
       |    UNION ALL
       |    SELECT pr.src_a, pr.src_b, rk.reg, rk.mj
       |    FROM pr JOIN rk ON rk.g = pr.src_b) t
       |  GROUP BY src_a, src_b, reg),
       |su AS (SELECT src_a, src_b,
       |              SUM((1::UBIGINT << (${w + 1} - mj))::HUGEINT) AS sp,
       |              COUNT(*) AS cnt FROM ur GROUP BY src_a, src_b),
       |uest AS (SELECT src_a, src_b, ${fold("su")} AS est_union FROM su)
       |SELECT src_a, src_b, ea.e AS est_a, eb.e AS est_b, est_union,
       |  round(ea.e + eb.e - est_union, 4) AS est_common
       |FROM uest
       |JOIN est ea ON ea.g = src_a
       |JOIN est eb ON eb.g = src_b
       |ORDER BY src_a, src_b""".stripMargin
  }

  /** [[hashLongCtes]] plus the signed conversion: input CTE
    * `keys(keep..., k)` (k a non-negative BIGINT cast to HUGEINT),
    * output CTE `key_hash_signed(keep..., hv)` where hv is Spark's
    * SIGNED `xxhash64(key)` — the form ORDER BY / comparison sites
    * need (the unsigned image sorts differently).
    */
  def keyHashSignedCtes(keep: String): String =
    s"""${hashLongCtes(keep)},
       |key_hash_signed AS (SELECT $keep,
       |  (h - CASE WHEN h >= 9223372036854775808::HUGEINT
       |     THEN $M64::HUGEINT ELSE 0::HUGEINT END)::BIGINT AS hv
       |  FROM key_hash)""".stripMargin

  /** CTE block hashing ARBITRARY-length ASCII strings with Spark's
    * single-argument `xxhash64(s)` — the full `hashUnsafeBytes` path
    * including the 32-byte stripe loop (4 accumulator lanes as a
    * `list_reduce` over a STRUCT accumulator), the 8-byte word tail,
    * the 4-byte chunk, the byte tail, and fmix. This removes
    * [[tokHashCtes]]'s ≤8-byte limitation (that generator stays for
    * the d08 permutation pairs, where the per-(token, i) seed makes
    * the short-tail-only form cheaper).
    *
    * Validated bit-for-bit against Spark 4.1.2 `xxhash64` for string
    * lengths 0–200 (prototype harness, 148/148; the algorithm was
    * read out of `XXH64.class` bytecode — `hashBytesByWords` consumes
    * floor(len/32) stripes then floor(len/8) words, and
    * `hashUnsafeBytes` finishes the len%8 tail as 4-byte chunk +
    * bytes).
    *
    * Input CTE `dstr(s)` must exist; output CTE `str_hash(s, hv)`
    * with hv the SIGNED Spark hash. ASCII precondition asserted like
    * [[tokHashCtes]]; length is unrestricted.
    */
  def strHashCtes(seed: Long = 42L): String = {
    val v10 = (BigInt(seed) + P1 + P2) % M64
    val v20 = (BigInt(seed) + P2) % M64
    val v30 = (BigInt(seed) + M64) % M64
    val v40 = (BigInt(seed) - P1 + M64) % M64
    val hShort = (BigInt(seed) + P5) % M64
    def lane(v: String, w: String): String =
      wmul(rotl(add(v, wmul(w, P2)), 31), P1)
    def mergeRound(h: String, v: String): String =
      add(wmul(xor(h, wmul(rotl(wmul(v, P2), 31), P1)), P1), s"$P4::HUGEINT")
    val laneStruct =
      "{'v1': " + lane("acc.v1", "e.v1") + ", 'v2': " + lane("acc.v2", "e.v2") +
        ", 'v3': " + lane("acc.v3", "e.v3") + ", 'v4': " + lane("acc.v4", "e.v4") + "}"
    val initStruct =
      s"{'v1': $v10::HUGEINT, 'v2': $v20::HUGEINT, 'v3': $v30::HUGEINT, 'v4': $v40::HUGEINT}"
    val stripeStruct =
      "{'v1': ws[4*t - 3], 'v2': ws[4*t - 2], 'v3': ws[4*t - 1], 'v4': ws[4*t]}"
    val hMerged = Seq("vv.v1", "vv.v2", "vv.v3", "vv.v4").foldLeft(
      add(add(add(rotl("vv.v1", 1), rotl("vv.v2", 7)),
        rotl("vv.v3", 12)), rotl("vv.v4", 18)))(mergeRound)
    val wordLe = "(" + (0 to 7).map {
      case 0 => "bs[8*j - 7]"
      case i => s"bs[8*j - 7 + $i] * ${BigInt(1) << (8 * i)}::HUGEINT"
    }.mkString(" + ") + ")"
    val wordStep =
      add(wmul(rotl(xor("acc", wmul(rotl(wmul("w", P2), 31), P1)), 27), P1),
        s"$P4::HUGEINT")
    val k4 = "(bs[8*nw + 1] + bs[8*nw + 2] * 256::HUGEINT" +
      " + bs[8*nw + 3] * 65536::HUGEINT + bs[8*nw + 4] * 16777216::HUGEINT)"
    val h4 = add(wmul(rotl(xor("h", wmul(k4, P1)), 23), P2), s"$P3::HUGEINT")
    val byteStep = wmul(rotl(xor("acc", wmul("b", P5)), 11), P1)
    s"""xs0 AS (SELECT CASE WHEN length(s) <> strlen(s)
       |  THEN error('XxHashSql precondition violated: non-ASCII string: ' || s)
       |  ELSE s END AS s FROM dstr),
       |xs1 AS (SELECT s, strlen(s)::HUGEINT AS len, strlen(s) AS ilen,
       |  list_transform(range(1, strlen(s) + 1), j -> ord(substr(s, j, 1))::HUGEINT) AS bs
       |  FROM xs0),
       |xs2 AS (SELECT s, len, ilen, bs, ilen // 8 AS nw,
       |  CASE WHEN ilen >= 32 THEN ilen // 32 ELSE 0 END AS ns,
       |  list_transform(range(1, ilen // 8 + 1), j -> $wordLe) AS ws
       |  FROM xs1),
       |xs3 AS (SELECT s, len, ilen, bs, nw, ns, ws,
       |  list_reduce(list_prepend($initStruct,
       |    list_transform(range(1, ns + 1), t -> $stripeStruct)),
       |    (acc, e) -> $laneStruct) AS vv
       |  FROM xs2),
       |xs4 AS (SELECT s, len, ilen, bs, nw, ns, ws,
       |  CASE WHEN ilen >= 32 THEN $hMerged ELSE $hShort::HUGEINT END AS h
       |  FROM xs3),
       |xs5 AS (SELECT s, ilen, bs, nw, ns, ws, ${add("h", "len")} AS h FROM xs4),
       |xs6 AS (SELECT s, ilen, bs, nw,
       |  list_reduce(list_prepend(h, ws[4*ns + 1 : nw]), (acc, w) -> $wordStep) AS h
       |  FROM xs5),
       |xs7 AS (SELECT s, ilen, bs, nw,
       |  CASE WHEN ilen % 8 >= 4 THEN $h4 ELSE h END AS h
       |  FROM xs6),
       |xs8 AS (SELECT s,
       |  list_reduce(list_prepend(h,
       |    bs[8*nw + (CASE WHEN ilen % 8 >= 4 THEN 4 ELSE 0 END) + 1 : ilen]),
       |    (acc, b) -> $byteStep) AS h
       |  FROM xs7),
       |${fmixCtes("xf", "xs8", "s")},
       |str_hash AS (SELECT s,
       |  (h - CASE WHEN h >= 9223372036854775808::HUGEINT
       |     THEN $M64::HUGEINT ELSE 0::HUGEINT END)::BIGINT AS hv
       |  FROM xf5)""".stripMargin
  }

  /** [[strHashCtes]] with the seed as a per-row COLUMN instead of a
    * compile-time constant — the generator for k-permutation MinHash
    * over arbitrary-length strings (each permutation i hashes with
    * its own seed, so one pipeline instantiation covers all k seed
    * values; the constant-seed form would need k colliding CTE
    * chains). Input CTE `dstr(s, i, sd)` must exist with `sd` the
    * UNSIGNED HUGEINT seed; output CTE `str_hash(s, i, hv)` with hv
    * the SIGNED Spark `xxhash64(s, seed)`. Same validated arithmetic
    * as [[strHashCtes]] — only the five seed-derived init values
    * become expressions of `sd`. Directly cross-checked against
    * `XXH64.hashUnsafeBytes` for 40/61/72-byte strings at three
    * seeds (stripe loop + word/chunk/byte tails all exercised,
    * bit-equal), on top of d41's end-to-end EXACT gate whose
    * tripled-token twin docs keep ≥32-byte shingles in every run.
    */
  def strHashCtesSeeded(): String = {
    def lane(v: String, w: String): String =
      wmul(rotl(add(v, wmul(w, P2)), 31), P1)
    def mergeRound(h: String, v: String): String =
      add(wmul(xor(h, wmul(rotl(wmul(v, P2), 31), P1)), P1), s"$P4::HUGEINT")
    val laneStruct =
      "{'v1': " + lane("acc.v1", "e.v1") + ", 'v2': " + lane("acc.v2", "e.v2") +
        ", 'v3': " + lane("acc.v3", "e.v3") + ", 'v4': " + lane("acc.v4", "e.v4") + "}"
    val initStruct =
      "{'v1': " + add("sd", s"${(P1 + P2) % M64}::HUGEINT") +
        ", 'v2': " + add("sd", s"$P2::HUGEINT") +
        ", 'v3': sd, 'v4': " + add("sd", s"${(M64 - P1) % M64}::HUGEINT") + "}"
    val hShort = add("sd", s"$P5::HUGEINT")
    val stripeStruct =
      "{'v1': ws[4*t - 3], 'v2': ws[4*t - 2], 'v3': ws[4*t - 1], 'v4': ws[4*t]}"
    val hMerged = Seq("vv.v1", "vv.v2", "vv.v3", "vv.v4").foldLeft(
      add(add(add(rotl("vv.v1", 1), rotl("vv.v2", 7)),
        rotl("vv.v3", 12)), rotl("vv.v4", 18)))(mergeRound)
    val wordLe = "(" + (0 to 7).map {
      case 0 => "bs[8*j - 7]"
      case i => s"bs[8*j - 7 + $i] * ${BigInt(1) << (8 * i)}::HUGEINT"
    }.mkString(" + ") + ")"
    val wordStep =
      add(wmul(rotl(xor("acc", wmul(rotl(wmul("w", P2), 31), P1)), 27), P1),
        s"$P4::HUGEINT")
    val k4 = "(bs[8*nw + 1] + bs[8*nw + 2] * 256::HUGEINT" +
      " + bs[8*nw + 3] * 65536::HUGEINT + bs[8*nw + 4] * 16777216::HUGEINT)"
    val h4 = add(wmul(rotl(xor("h", wmul(k4, P1)), 23), P2), s"$P3::HUGEINT")
    val byteStep = wmul(rotl(xor("acc", wmul("b", P5)), 11), P1)
    s"""xs0 AS (SELECT CASE WHEN length(s) <> strlen(s)
       |  THEN error('XxHashSql precondition violated: non-ASCII string: ' || s)
       |  ELSE s END AS s, i, sd FROM dstr),
       |xs1 AS (SELECT s, i, sd, strlen(s)::HUGEINT AS len, strlen(s) AS ilen,
       |  list_transform(range(1, strlen(s) + 1), j -> ord(substr(s, j, 1))::HUGEINT) AS bs
       |  FROM xs0),
       |xs2 AS (SELECT s, i, sd, len, ilen, bs, ilen // 8 AS nw,
       |  CASE WHEN ilen >= 32 THEN ilen // 32 ELSE 0 END AS ns,
       |  list_transform(range(1, ilen // 8 + 1), j -> $wordLe) AS ws
       |  FROM xs1),
       |xs3 AS (SELECT s, i, sd, len, ilen, bs, nw, ns, ws,
       |  list_reduce(list_prepend($initStruct,
       |    list_transform(range(1, ns + 1), t -> $stripeStruct)),
       |    (acc, e) -> $laneStruct) AS vv
       |  FROM xs2),
       |xs4 AS (SELECT s, i, sd, len, ilen, bs, nw, ns, ws,
       |  CASE WHEN ilen >= 32 THEN $hMerged ELSE $hShort END AS h
       |  FROM xs3),
       |xs5 AS (SELECT s, i, ilen, bs, nw, ns, ws, ${add("h", "len")} AS h FROM xs4),
       |xs6 AS (SELECT s, i, ilen, bs, nw,
       |  list_reduce(list_prepend(h, ws[4*ns + 1 : nw]), (acc, w) -> $wordStep) AS h
       |  FROM xs5),
       |xs7 AS (SELECT s, i, ilen, bs, nw,
       |  CASE WHEN ilen % 8 >= 4 THEN $h4 ELSE h END AS h
       |  FROM xs6),
       |xs8 AS (SELECT s, i,
       |  list_reduce(list_prepend(h,
       |    bs[8*nw + (CASE WHEN ilen % 8 >= 4 THEN 4 ELSE 0 END) + 1 : ilen]),
       |    (acc, b) -> $byteStep) AS h
       |  FROM xs7),
       |${fmixCtes("xf", "xs8", "s, i")},
       |str_hash AS (SELECT s, i,
       |  (h - CASE WHEN h >= 9223372036854775808::HUGEINT
       |     THEN $M64::HUGEINT ELSE 0::HUGEINT END)::BIGINT AS hv
       |  FROM xf5)""".stripMargin
  }

  /** The d41 oracle: shingle (word 3-gram) MinHash with Spark-xxhash64
    * permutation hashes — each permutation i hashes the shingle STRING
    * with seed `XXH64.hashInt(i, 42)` (the kernel's seed schedule,
    * interpolated as literals), MIN over SIGNED hashes per (doc, i),
    * banding, candidates, agreement fraction — the d08 pipeline at
    * shingle grain via [[strHashCtesSeeded]].
    */
  def d41ShingleFastOracle(n: Int = 3, numHashes: Int = 16,
                           bandRows: Int = 8,
                           minEstimate: Double = 0.7,
                           mediaCte: String =
                             "media AS (SELECT doc_id, text FROM documents)")
      : String = {
    val shingleExpr = (0 until n).map {
      case 0 => "ts[i]"
      case j => s"ts[i + $j]"
    }.mkString(" || ' ' || ")
    val seedRows = (0 until numHashes).map { i =>
      val signed = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)
      val unsigned = if (signed < 0) BigInt(signed) + M64 else BigInt(signed)
      s"($i, $unsigned::HUGEINT)"
    }.mkString(", ")
    s"""WITH $mediaCte,
       |tk AS (SELECT doc_id, string_split(text, ' ') AS ts FROM media),
       |toks AS (
       |  SELECT doc_id, UNNEST(list_distinct(list_transform(
       |    range(1, len(ts) - ${n - 2}),
       |    i -> $shingleExpr))) AS tok
       |  FROM tk WHERE len(ts) >= $n),
       |seeds AS (SELECT * FROM (VALUES $seedRows) t(i, sd)),
       |dstr AS (SELECT d.tok AS s, sd.i, sd.sd
       |  FROM (SELECT DISTINCT tok FROM toks) d CROSS JOIN seeds sd),
       |${strHashCtesSeeded()},
       |sig AS (
       |  SELECT toks.doc_id, sh.i, MIN(sh.hv) AS mh
       |  FROM toks JOIN str_hash sh ON sh.s = toks.tok
       |  GROUP BY 1, 2),
       |band AS (
       |  SELECT doc_id, i // $bandRows AS band,
       |    string_agg(mh::VARCHAR, ',' ORDER BY i) AS bsig
       |  FROM sig GROUP BY doc_id, i // $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig
       |    AND a.doc_id < b.doc_id),
       |agree AS (
       |  SELECT c.id_a, c.id_b,
       |    COUNT(CASE WHEN sa.mh = sb.mh THEN 1 END) AS n_agree
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(n_agree AS DOUBLE) / $numHashes AS est_jaccard
       |FROM agree WHERE CAST(n_agree AS DOUBLE) / $numHashes >= $minEstimate
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** The d08 oracle: identical pipeline to the d03 MD5-portable oracle
    * (TextQueries) but with the Spark-xxhash64 permutation hashes —
    * MIN over SIGNED hashes per (doc, perm), r=8 banding, candidate
    * pairs, agreement fraction >= 0.7.
    */
  def d08MinhashFastOracle(numHashes: Int = 16, bandRows: Int = 8,
                           minEstimate: Double = 0.7): String =
    s"""WITH toks AS (
       |  SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
       |  FROM documents),
       |dtok AS (SELECT DISTINCT tok FROM toks),
       |${tokHashCtes(numHashes)},
       |sig AS (
       |  SELECT t.doc_id, th.i, MIN(th.hv) AS mh
       |  FROM toks t JOIN tok_hash th ON th.tok = t.tok
       |  GROUP BY t.doc_id, th.i),
       |band AS (
       |  SELECT doc_id, i // $bandRows AS band,
       |    string_agg(mh::VARCHAR, ',' ORDER BY i) AS bsig
       |  FROM sig GROUP BY doc_id, i // $bandRows),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM band a JOIN band b ON a.band = b.band AND a.bsig = b.bsig
       |    AND a.doc_id < b.doc_id),
       |agree AS (
       |  SELECT c.id_a, c.id_b,
       |    COUNT(CASE WHEN sa.mh = sb.mh THEN 1 END) AS n_agree
       |  FROM cand c
       |  JOIN sig sa ON sa.doc_id = c.id_a
       |  JOIN sig sb ON sb.doc_id = c.id_b AND sb.i = sa.i
       |  GROUP BY 1, 2)
       |SELECT id_a, id_b, CAST(n_agree AS DOUBLE) / $numHashes AS est_jaccard
       |FROM agree WHERE CAST(n_agree AS DOUBLE) / $numHashes >= $minEstimate
       |ORDER BY id_a, id_b""".stripMargin
}
