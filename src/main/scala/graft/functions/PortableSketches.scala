package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-digest portable sketch kernels.
  *
  * One MD5 digest per token yields a 60-bit base value `h1` (first 15
  * hex digits). The k MinHash permutations are independent universal
  * hashes over it:
  *
  *   x    = h1 mod p                 (p = 2^31 - 1, prime)
  *   h_i  = (a_i * x + b_i) mod p
  *   a_i  = first 7 hex digits of md5('a' || i), + 1   (28 bits, != 0)
  *   b_i  = first 7 hex digits of md5('b' || i)
  *
  * `a_i * x < 2^59`, so plain 64-bit arithmetic never overflows and
  * any engine reproduces the numbers from md5 hex alone. (A cheaper
  * `h1 + i*h2` double-hashing scheme was rejected: the same small-h1
  * token tends to win every lane, which correlates the permutations
  * and badly overestimates Jaccard.) This is one digest per token —
  * ~16x less hashing than one seeded digest per permutation — while
  * remaining bit-for-bit verifiable by the DuckDB oracle.
  */
object PortableHashKernel {

  val P: Long = 2147483647L // 2^31 - 1

  /** Per-permutation universal-hash coefficients, derived from MD5 so
    * every engine can recompute them: first 7 hex digits of
    * md5("a"+i) / md5("b"+i). Cached per k.
    */
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()

  def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k, _ => {
      val a = Array.tabulate(k)(i => hex7(s"a$i") + 1L)
      val b = Array.tabulate(k)(i => hex7(s"b$i"))
      (a, b)
    })

  /** First 7 hex digits of md5(s) as an unsigned 28-bit value. */
  def hex7(s: String): Long =
    lane1(MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))) >>> 32

  private val md = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def digest(s: UTF8String): Array[Byte] = {
    val m = md.get()
    m.reset()
    m.digest(s.getBytes)
  }

  /** First 15 hex digits of the digest as an unsigned 60-bit value. */
  def lane1(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** k-minima MinHash signature over non-null tokens; null iff no
    * non-null token exists (a signature of an empty set is undefined).
    */
  def minhash(tokens: ArrayData, k: Int): ArrayData = {
    val (as, bs) = coeffs(k)
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        any = true
        val x = lane1(digest(tokens.getUTF8String(t))) % P
        var i = 0
        while (i < k) {
          val v = (as(i) * x + bs(i)) % P
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      t += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Distinct word-n-gram 60-bit hashes of raw text in one pass:
    * tokenize (regex-split on single spaces, trailing empties kept —
    * exactly `split(text, " ")`), slide an n-token window, de-dupe the
    * n-gram STRINGS (first-occurrence order), hash each with the
    * 60-bit MD5 lane. Bit-identical to the declarative
    * `array_distinct(wordNgrams(text, n))` → `mdHash60` chain for
    * non-null text, without materializing token/n-gram arrays per
    * row. NULL text yields NULL (SQL convention) where the
    * declarative chain's `when` guard yields an empty array — both
    * explode to zero rows, so every consumer in this library behaves
    * identically; only a non-exploding consumer sees the difference.
    */
  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) {
      out(k) = lane1(digest(UTF8String.fromString(it.next())))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Shared byte-level token scan: start offsets of each token in the
    * UTF-8 bytes (split on 0x20, which never occurs inside a multibyte
    * sequence — byte-split ≡ `split(text, " ")`). Returns the starts
    * array with a sentinel at index nTok (= len + 1), so token k spans
    * `[starts(k), starts(k+1) - 1)` and the n-token window starting at
    * k spans `[starts(k), starts(k+n) - 1)` — which is EXACTLY the
    * bytes of the n-gram string (rejoining split parts with the same
    * delimiter reproduces the original span), so hashing the span in
    * place equals hashing the materialized n-gram string.
    */
  private def tokenStarts(arr: Array[Byte]): Array[Int] = {
    var nTok = 1
    var i = 0
    while (i < arr.length) { if (arr(i) == ' '.toByte) nTok += 1; i += 1 }
    val starts = new Array[Int](nTok + 1)
    var t = 1
    i = 0
    while (i < arr.length) {
      if (arr(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTok) = arr.length + 1
    starts
  }

  /** POSITIONAL word-n-gram 60-bit hashes: one value per window, in
    * order, duplicates kept — the span-scrubbing shape (pos matters).
    * Bit-identical to `posexplode(wordNgrams(text, n))` → `mdHash60`
    * without materializing any token or n-gram string: one byte copy
    * per row, one MD5 digest per window over the span bytes.
    */
  def ngramHashesPos(text: UTF8String, n: Int): ArrayData = {
    val arr = text.getBytes
    val starts = tokenStarts(arr)
    val nTok = starts.length - 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val m = md.get()
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      val s = starts(w)
      m.reset()
      m.update(arr, s, starts(w + n) - 1 - s)
      out(w) = lane1(m.digest())
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word-n-gram xxhash64 values (seed 42) — the engine-local
    * twin of [[ngramHashes]]: same windows, hashed in place with
    * Spark's own XXH64 over the span bytes, so every value equals
    * `xxhash64(<n-gram string>)` exactly. De-dup is on the 64-bit hash
    * (≡ string de-dup modulo a ~2^-64 in-document collision).
    */
  def ngramHashesXx(text: UTF8String, n: Int): ArrayData = {
    val arr = text.getBytes
    val starts = tokenStarts(arr)
    val nTok = starts.length - 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var w = 0
    while (w <= nTok - n) {
      val s = starts(w)
      seen.add(org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s,
        starts(w + n) - 1 - s, 42L))
      w += 1
    }
    val out = new Array[Long](seen.size)
    var k = 0
    val it = seen.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Positional (duplicates-kept) word-n-gram xxhash64 values — the
    * engine-local twin of [[ngramHashesPos]]: one value per window in
    * order, each equal to `xxhash64(<n-gram string>)` exactly (XXH64
    * over the span bytes). The repetition-counting shape: grouping on
    * these hashes ≡ grouping on the n-gram strings modulo a ~2^-64
    * in-document collision.
    */
  def ngramHashesPosXx(text: UTF8String, n: Int): ArrayData = {
    val arr = text.getBytes
    val starts = tokenStarts(arr)
    val nTok = starts.length - 1
    if (nTok < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](nTok - n + 1)
    var w = 0
    while (w <= nTok - n) {
      val s = starts(w)
      out(w) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s,
        starts(w + n) - 1 - s, 42L)
      w += 1
    }
    new GenericArrayData(out)
  }

  /** Fast MinHash signature straight from raw text: per-permutation
    * minima of `xxhash64(i, token)` over the tokens. Bit-identical to
    * the declarative `array((0..k).map(i => array_min(transform(toks,
    * t => xxhash64(lit(i), t)))))` chain — Spark's XxHash64 folds the
    * int literal then the string bytes, i.e. `hashUnsafeBytes(token,
    * hashInt(i, 42))` — but in ONE pass over the token byte spans with
    * zero array materialization. Distinctness of tokens is irrelevant
    * to minima, so the declarative chain's `array_distinct` needs no
    * kernel counterpart. Null iff the text is null (split never yields
    * an empty token array).
    */
  /** Shingle (word n-gram) flavor of [[minhashXx]]: each permutation
    * hashes the n-token window SPAN in place — `[starts(t),
    * starts(t+n) - 1)` IS the bytes of the n-gram string (see
    * [[tokenStarts]]), so no shingle string ever materializes.
    * Duplicates need no dedup (MIN is idempotent). Returns null for
    * texts with fewer than `n` tokens (no shingles — the empty-set
    * convention of the portable chain).
    */
  def shingleMinhashXx(text: UTF8String, n: Int, k: Int): ArrayData = {
    val arr = text.getBytes
    val starts = tokenStarts(arr)
    val nTok = starts.length - 1
    if (nTok < n) return null
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) {
      seeds(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t + n <= nTok) {
      val s = starts(t)
      val len = starts(t + n) - 1 - s
      i = 0
      while (i < k) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, len, seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  def minhashXx(text: UTF8String, k: Int): ArrayData = {
    val arr = text.getBytes
    val starts = tokenStarts(arr)
    val nTok = starts.length - 1
    val seeds = new Array[Long](k)
    var i = 0
    while (i < k) {
      seeds(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(i, 42L)
      i += 1
    }
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < nTok) {
      val s = starts(t)
      val len = starts(t + 1) - 1 - s
      i = 0
      while (i < k) {
        val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
          arr, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, len, seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit SimHash: per-bit majority vote over lane1 of each non-null
    * token digest (same vote rule as SimHash64/BitMajority64).
    */
  def simhash(tokens: ArrayData): Long = {
    val counts = new Array[Int](60)
    var nonNull = 0
    var t = 0
    val n = tokens.numElements()
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        nonNull += 1
        val h = lane1(digest(tokens.getUTF8String(t)))
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) * 2 > nonNull) out |= (1L << j)
      j += 1
    }
    out
  }
}

object PortableSketches {

  private def checkTokens(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tokens argument must be array<string>, got ${other.catalogString}")
  }

  /** MinHash signature as a single-pass native expression — one MD5
    * digest per token, then k universal-hash permutations
    * `(a_i * h + b_i) mod p` (a_i, b_i derived from md5("a"+i) /
    * md5("b"+i), p = 2^31-1) whose minima form the signature.
    */
  case class MinHash60(child: Expression, k: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = checkTokens(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.minhash(input.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.PortableHashKernel.minhash($c, $k);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 60-bit portable SimHash as a single-pass native expression. */
  case class SimHash60(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType

    override def checkInputDataTypes(): TypeCheckResult = checkTokens(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.simhash(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.PortableHashKernel.simhash($c)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Fused tokenize→n-gram→distinct→hash kernel (decontamination /
    * span-census hot path). Input is the raw text column.
    */
  case class NgramHash60(child: Expression, n: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"text argument must be string, got ${other.catalogString}")
    }

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.ngramHashes(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PortableHashKernel.ngramHashes($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  private def checkText(e: Expression): TypeCheckResult = e.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text argument must be string, got ${other.catalogString}")
  }

  /** Positional (duplicates-kept) fused n-gram MD5-60 kernel — the
    * span-scrubbing hot path (position must survive).
    */
  case class NgramHashPos60(child: Expression, n: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = checkText(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.ngramHashesPos(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PortableHashKernel.ngramHashesPos($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Distinct fused n-gram xxhash64 kernel — engine-local span census. */
  case class NgramHashXx(child: Expression, n: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = checkText(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.ngramHashesXx(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PortableHashKernel.ngramHashesXx($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Positional fused n-gram xxhash64 kernel — repetition counting. */
  case class NgramHashPosXx(child: Expression, n: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = checkText(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.ngramHashesPosXx(input.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PortableHashKernel.ngramHashesPosXx($c, $n)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Fused fast-MinHash kernel over raw text (xxhash64 flavor). */
  /** Shingle flavor — null for texts shorter than `n` tokens, hence
    * the MinHash60-style null-propagating codegen.
    */
  case class ShingleMinHashXx(child: Expression, n: Int, k: Int)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult = checkText(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.shingleMinhashXx(input.asInstanceOf[UTF8String], n, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        s"""
           |${ev.value} = graft.functions.PortableHashKernel.shingleMinhashXx($c, $n, $k);
           |${ev.isNull} = (${ev.value} == null);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  case class MinHashXx(child: Expression, k: Int) extends UnaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def checkInputDataTypes(): TypeCheckResult = checkText(child)

    override def nullSafeEval(input: Any): Any =
      PortableHashKernel.minhashXx(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.PortableHashKernel.minhashXx($c, $k)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def minhash60(tokens: Column, k: Int): Column =
    ColumnBridge.column(MinHash60(ColumnBridge.expression(tokens), k))

  def simhash60(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))

  def ngramHashes60(text: Column, n: Int): Column =
    ColumnBridge.column(NgramHash60(ColumnBridge.expression(text), n))

  def ngramHashesPos60(text: Column, n: Int): Column =
    ColumnBridge.column(NgramHashPos60(ColumnBridge.expression(text), n))

  def ngramHashesXx(text: Column, n: Int): Column =
    ColumnBridge.column(NgramHashXx(ColumnBridge.expression(text), n))

  def ngramHashesPosXx(text: Column, n: Int): Column =
    ColumnBridge.column(NgramHashPosXx(ColumnBridge.expression(text), n))

  def minhashXx(text: Column, k: Int): Column =
    ColumnBridge.column(MinHashXx(ColumnBridge.expression(text), k))

  def shingleMinhashXx(text: Column, n: Int, k: Int): Column =
    ColumnBridge.column(ShingleMinHashXx(ColumnBridge.expression(text), n, k))
}
