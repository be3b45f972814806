package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels behind the native hash expressions. Each is one
  * tight loop per row, called from whole-stage codegen (or from
  * `nullSafeEval` on interpreted paths such as inside higher-order
  * functions). Every kernel reproduces, bit for bit, the semantics of
  * the built-in-expression pipeline it replaces — all hashing is
  * md5-derived and all arithmetic is integer or strict left-to-right
  * IEEE double, so the DuckDB oracles of the dedup/similarity
  * operators keep hash-matching exactly.
  */
object HashImpl {

  /** Levenshtein distance CAPPED at 1: returns 0 (equal), 1, or 2
    * (meaning "> 1"). The full DP that `levenshtein()` runs costs
    * ~2.7 µs per 18-char pair (measured on this box — it decodes code
    * points and fills an O(n²) table even when the caller only gates
    * on ≤ 1); a bounded check is O(n): equal-length strings need a
    * mismatch count, off-by-one lengths need a one-gap scan, anything
    * else is > 1. The fast path runs byte-level and is exact for
    * pure-ASCII inputs (byte = char = code point); any high bit on
    * either side falls back to the exact code-point DP, so the result
    * equals min(levenshtein(a, b), 2) on EVERY input. ~50 ns per pair
    * on the fuzzy-match confirm stream — the stage that dominated the
    * er operators' runtime. */
  def boundedLev1(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Long = {
    val la = a.numBytes()
    val lb = b.numBytes()
    var i = 0
    while (i < la) { if (a.getByte(i) < 0) return fallbackLev1(a, b); i += 1 }
    i = 0
    while (i < lb) { if (b.getByte(i) < 0) return fallbackLev1(a, b); i += 1 }
    if (la == lb) {
      var diff = 0L
      i = 0
      while (i < la) {
        if (a.getByte(i) != b.getByte(i)) { diff += 1; if (diff > 1) return 2L }
        i += 1
      }
      diff
    } else if (math.abs(la - lb) == 1) {
      val (s, t) = if (la < lb) (a, b) else (b, a) // t one byte longer
      val n = math.min(la, lb)
      var j = 0
      while (j < n && s.getByte(j) == t.getByte(j)) j += 1
      // skip t's extra byte; the tails must match exactly
      while (j < n) { if (s.getByte(j) != t.getByte(j + 1)) return 2L; j += 1 }
      1L
    } else 2L
  }

  private def fallbackLev1(a: org.apache.spark.unsafe.types.UTF8String,
      b: org.apache.spark.unsafe.types.UTF8String): Long = {
    val d = a.levenshteinDistance(b)
    if (d > 1) 2L else d.toLong
  }

  // per-thread digest instance: getInstance runs a JCA provider lookup
  // plus an allocation, and every kernel here calls `md5` once per ROW
  // on the hottest corpus-pass paths (for bloomBits the lookup is a
  // comparable fraction of the whole row cost). MessageDigest is not
  // thread-safe but kernels run on task threads — a ThreadLocal with
  // reset() is exactly the right sharing.
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private def md5: MessageDigest = {
    val d = md5Local.get()
    d.reset()
    d
  }

  /** 64-bit SimHash of the DISTINCT tokens in `toks`, packed as
    * [hi, lo] 32-bit halves.
    *
    * Equivalent built-in pipeline: explode(array_distinct(toks)) →
    * md5 per token → 64 conditional sums in one aggregation → pack
    * (bit b of the signature is bit (7 − b%8) of md5 byte b/8; vote
    * sbit_b = 2·cnt_b ≥ n). The kernel form needs NO shuffle: the
    * signature is a per-row projection.
    */
  def simhash64(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val seen = new java.util.HashSet[UTF8String]()
    val counts = new Array[Int](64)
    var total = 0
    val digest = md5
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      if (t != null && seen.add(t)) {
        total += 1
        digest.reset()
        val d = digest.digest(t.getBytes)
        var b = 0
        while (b < 64) {
          counts(b) += (d(b >> 3) >> (7 - (b & 7))) & 1
          b += 1
        }
      }
      i += 1
    }
    // REFUSE zero distinct tokens (empty or all-null array): every
    // majority vote 2·0 ≥ 0 passes, so all such docs would share the
    // all-ones signature and collide pairwise in any Hamming join —
    // the same quadratic blow-up minhashSig's guard exists to
    // prevent, raised loudly instead of silently. Unreachable through
    // the operators: ws_tokens never returns an empty array
    // ("" tokenizes to [""], one empty-string token).
    if (total == 0) throw new IllegalArgumentException(
      "simhash64 of zero distinct tokens is undefined (all such docs " +
        "would share the all-ones signature and collide pairwise) — " +
        "filter size(toks) > 0 before signing")
    var hi = 0L
    var lo = 0L
    var b = 0
    while (b < 32) {
      if (2 * counts(b) >= total) hi |= 1L << b
      b += 1
    }
    while (b < 64) {
      if (2 * counts(b) >= total) lo |= 1L << (b - 32)
      b += 1
    }
    new GenericArrayData(Array(hi, lo))
  }

  /** Sorted 60-bit md5 keys of the distinct word `n`-gram shingles of
    * a token array (shingle = n consecutive tokens joined by a single
    * space; key = first 15 md5 hex digits as an unsigned value —
    * `conv(substring(md5(sh), 1, 15), 16, 10)`).
    */
  def shingleHashes(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[String]()
    val keys = new java.util.ArrayList[java.lang.Long](len)
    val digest = md5
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= len - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        val t = toks.getUTF8String(i + j)
        if (t != null) sb.append(t.toString)
        j += 1
      }
      val sh = sb.toString
      if (seen.add(sh)) {
        digest.reset()
        val d = digest.digest(sh.getBytes("UTF-8"))
        var v = 0L
        var k = 0
        while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
        v = (v << 4) | ((d(7) >> 4) & 0xfL)
        keys.add(v)
      }
      i += 1
    }
    val out = new Array[Long](keys.size())
    var k = 0
    while (k < out.length) { out(k) = keys.get(k); k += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  /** MinHash signature: slot i = min over the doc's 60-bit shingle
    * keys of ((2i+1)·(kh >> 28) + 0x9e3779b9 + i·0x85ebca6b) mod 2³²
    * — the universal hash family of the MinHash operator (operands
    * stay < 2⁶³, so plain long arithmetic is exact).
    *
    * REFUSES the empty key set: min over nothing would yield the
    * Long.MaxValue sentinel in every slot, so every shingle-less doc
    * would share ONE degenerate signature — all of them colliding
    * into a single LSH band bucket and blowing the candidate join up
    * quadratically. The operators filter `n_sh > 0` before banding;
    * an unguarded SQL caller gets this loud error instead of the
    * silent blow-up. */
  def minhashSig(khs: ArrayData, numHashes: Int): ArrayData = {
    val n = khs.numElements()
    if (n == 0) throw new IllegalArgumentException(
      "minhash_sig of an EMPTY key set is undefined (every empty doc " +
        "would share one degenerate signature and collide into a " +
        "single LSH bucket) — filter size(keys) > 0 before signing")
    val out = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = 2L * i + 1
      val b = 0x9e3779b9L + i.toLong * 0x85ebca6bL
      var min = Long.MaxValue
      var j = 0
      while (j < n) {
        val h = ((khs.getLong(j) >> 28) * a + b) % 4294967296L
        if (h < min) min = h
        j += 1
      }
      out(i) = min
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All `tables` LSH bucket signatures of an embedding in one pass:
    * bucket t has bit b set iff v · planes(t)(b) ≥ 0, the dot product
    * accumulated strictly left-to-right (identical to
    * [[ArrayDotProduct]] and DuckDB `list_reduce`).
    */
  def lshBuckets(v: ArrayData, planes: Array[Array[Array[Double]]])
      : ArrayData = {
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tp = planes(t)
      var bucket = 0L
      var b = 0
      while (b < tp.length) {
        val h = tp(b)
        val n = math.min(v.numElements(), h.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += v.getDouble(i) * h(i); i += 1 }
        if (acc >= 0) bucket |= 1L << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Count of common elements of two SORTED-ASCENDING distinct long
    * arrays by a single merge walk. Equivalent built-in pipeline:
    * `size(array_intersect(a, b))` — which builds a per-pair hash set
    * and materializes the intersection array, pure garbage when only
    * the COUNT is needed. Identical result on the sorted-distinct
    * arrays the shingle/signature kernels emit. This is the
    * exact-verification inner loop of the near-dup operators: it runs
    * once per CANDIDATE PAIR, the hottest loop in the dedup family at
    * scale. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Gopher repetition statistics of one document in a single per-row
    * pass — NO shuffle, NO gram explode: the five statistics the
    * repetition rules need, as [top2, top3, top4, dup5, dup6] where
    * top_n = max over n-grams of count·chars (chars = gram length
    * including joining spaces, in characters) and dup_n = Σ over
    * n-grams occurring ≥ 2× of count·chars.
    *
    * Equivalent built-in pipeline: explode 5 shingle widths →
    * count per (doc, n, gram) → max/sum per (doc, n) — two shuffles
    * of gram-text keys. The kernel form makes the whole operator a
    * per-row projection, which is the correct shape at any scale:
    * every statistic is a within-document property.
    */
  def gopherStats(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    val out = new Array[Long](5)
    val sb = new java.lang.StringBuilder(96)
    var n = 2
    while (n <= 6) {
      if (len >= n) {
        // gram -> packed (count, chars): chars fits in 31 bits, count in 32
        val m = new java.util.HashMap[String, Array[Long]]()
        var i = 0
        while (i <= len - n) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            val t = toks.getUTF8String(i + j)
            if (t != null) sb.append(t.toString)
            j += 1
          }
          val g = sb.toString
          val slot = m.get(g)
          if (slot == null) m.put(g, Array(1L, g.codePointCount(0, g.length).toLong))
          else slot(0) += 1L
          i += 1
        }
        var top = 0L
        var dup = 0L
        val it = m.values().iterator()
        while (it.hasNext) {
          val slot = it.next()
          val prod = slot(0) * slot(1)
          if (prod > top) top = prod
          if (slot(0) >= 2L) dup += prod
        }
        if (n <= 4) out(n - 2) = top else out(n - 2) = dup
      }
      n += 1
    }
    new GenericArrayData(out)
  }

  /** Hashed-n-gram feature buckets of one document (the DSIR feature
    * map): one bucket id per unigram and bigram OCCURRENCE,
    * bucket = first 8 md5 hex digits of the gram as an unsigned value
    * mod 1024 — bit-identical to
    * `conv(substring(md5(gram), 1, 8), 16, 10) % 1024` over the
    * exploded gram stream, but the gram strings never leave the row:
    * only compact long bucket ids flow into the count/score
    * aggregations.
    */
  def gramBuckets(toks: ArrayData): ArrayData = {
    val len = toks.numElements()
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](2 * len - 1)
    val digest = md5
    val sb = new java.lang.StringBuilder(64)
    def bucketOf(s: String): Long = {
      digest.reset()
      val d = digest.digest(s.getBytes("UTF-8"))
      val w = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      w % 1024L
    }
    var i = 0
    while (i < len) {
      val t = toks.getUTF8String(i)
      out(i) = bucketOf(if (t == null) "" else t.toString)
      i += 1
    }
    i = 0
    while (i < len - 1) {
      sb.setLength(0)
      val a = toks.getUTF8String(i)
      val b = toks.getUTF8String(i + 1)
      if (a != null) sb.append(a.toString)
      sb.append(' ')
      if (b != null) sb.append(b.toString)
      out(len + i) = bucketOf(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  private val Space = UTF8String.fromString(" ")

  /** Word n-gram shingles (space-joined) of a token array — the
    * kernel form of the sequence→transform→slice→concat_ws→filter
    * built-in pipeline it replaces (which interprets a lambda and
    * allocates a slice sub-array PER GRAM — measured 8 s of a 12 s
    * bigram-stream pass at the 500k-doc scale set). One pass, one
    * UTF8String byte-concat per gram. Exact equivalence: size ≥ n
    * yields size−n+1 grams (window i joins toks[i..i+n) with " ",
    * nulls skipped exactly as concat_ws does), size < n yields the
    * empty array (the old when(...)→filter path). */
  def wordShingles(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n) return new GenericArrayData(new Array[Any](0))
    val ts = new Array[UTF8String](len)
    var i = 0
    while (i < len) { ts(i) = toks.getUTF8String(i); i += 1 }
    val out = new Array[Any](len - n + 1)
    i = 0
    while (i <= len - n) {
      out(i) =
        if (n == 2) UTF8String.concatWs(Space, ts(i), ts(i + 1))
        else {
          val parts = new Array[UTF8String](n)
          System.arraycopy(ts, i, parts, 0, n)
          UTF8String.concatWs(Space, parts: _*)
        }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Whitespace tokenizer kernel — byte-exact to
    * `split(trim(text), "\\s+")` (the shared [[GraftFunctions.tokens]]
    * form, which Java-regex-splits every text operator's hot path).
    * Java's `\s` is the six ASCII chars [ \t\n\x0B\f\r] (no
    * UNICODE_CHARACTER_CLASS), and those bytes never occur inside a
    * UTF-8 multibyte sequence, so a single byte scan reproduces
    * Pattern.split(s, -1) exactly: one field per inter-run gap,
    * leading/trailing runs yield empty fields, no match yields the
    * whole input, "" yields [""]. trim() strips only ASCII 32 at both
    * ends, as Spark's trim does. */
  def whitespaceTokens(text: UTF8String): ArrayData = {
    val s = text.trim()
    val n = s.numBytes()
    val bytes = s.getBytes
    def isWs(b: Byte): Boolean =
      b == 32 || b == 9 || b == 10 || b == 11 || b == 12 || b == 13
    val out = new java.util.ArrayList[Any](16)
    var fieldStart = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out.add(UTF8String.fromBytes(bytes, fieldStart, i - fieldStart))
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        fieldStart = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, fieldStart, n - fieldStart))
    new GenericArrayData(out.toArray)
  }

  /** `k` bloom bit positions of a pre-salted key string: md5 the UTF-8
    * bytes and take consecutive 4-byte big-endian windows mod `m` —
    * bit-identical to `CAST('0x' || substr(md5(s), 1 + 8j, 8) AS
    * BIGINT) % m` (8 hex digits ARE 4 digest bytes) but without
    * materializing the hex string or the radix parse, which profile
    * 3× more expensive than the digest itself. */
  def bloomBits(s: UTF8String, k: Int, m: Int): ArrayData = {
    val digest = md5
    val d = digest.digest(s.getBytes)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val w = ((d(4 * j) & 0xffL) << 24) | ((d(4 * j + 1) & 0xffL) << 16) |
        ((d(4 * j + 2) & 0xffL) << 8) | (d(4 * j + 3) & 0xffL)
      out(j) = w % m
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Bloom bit positions of a salted key string — [[HashImpl.bloomBits]].
  * STRING input (not an array), so it sits beside but outside the
  * ARRAY-kernel base class. */
case class BloomBitPositions(child: Expression, k: Int, m: Int)
  extends UnaryExpression {
  // the kernel slices k consecutive 4-byte windows of ONE 16-byte md5
  // digest: k > 4 would read past the digest (task-killing AIOOBE at
  // runtime) — fail at construction with the contract instead
  require(k >= 1 && k <= 4,
    s"bloom_bits supports 1..4 hash functions per digest (got k=$k); " +
      "derive additional salted digests for more")
  require(m >= 1, s"bloom_bits needs a positive bit-space size, got m=$m")
  override def prettyName: String = "bloom_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def nullSafeEval(s: Any): Any =
    HashImpl.bloomBits(s.asInstanceOf[UTF8String], k, m)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpl.bloomBits($c, $k, $m);")
  override protected def withNewChildInternal(newChild: Expression)
      : BloomBitPositions = copy(child = newChild)
}

/** Whitespace tokens of a text column — [[HashImpl.whitespaceTokens]].
  * STRING in, ARRAY<STRING> out. */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {
  override def prettyName: String = "ws_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING input, got ${other.simpleString}")
  }
  override def nullSafeEval(s: Any): Any =
    HashImpl.whitespaceTokens(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpl.whitespaceTokens($c);")
  override protected def withNewChildInternal(newChild: Expression): WhitespaceTokens =
    copy(child = newChild)
}

/** Word n-gram shingles of a token array — [[HashImpl.wordShingles]].
  * ARRAY<STRING> in AND out, so it sits beside but outside the
  * Long-array kernel base class. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING> input, got ${other.simpleString}")
  }
  override def nullSafeEval(toks: Any): Any =
    HashImpl.wordShingles(toks.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpl.wordShingles($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Merge-walk intersection count of two sorted ARRAY<LONG>s —
  * [[HashImpl.sortedIntersectCount]]. */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashImpl.sortedIntersectCount($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Levenshtein distance capped at 1 (0, 1, or 2 = "more") —
  * [[HashImpl.boundedLev1]]. */
case class BoundedLev1(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def prettyName: String = "bounded_lev1"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two STRING inputs, got " +
          s"${l.simpleString} and ${r.simpleString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.boundedLev1(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashImpl.boundedLev1($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BoundedLev1 =
    copy(left = newLeft, right = newRight)
}

/** Base for the unary kernel-backed expressions: ARRAY<LONG> result,
  * null-safe, codegen = a single static call (stays inside the
  * surrounding whole-stage-codegen span). Declares its input type so a
  * wrong-typed argument from `spark.sql` (these are registered as SQL
  * functions) fails at ANALYSIS time with a datatype-mismatch message
  * instead of a ClassCastException inside the kernel.
  */
abstract class HashKernelExpression extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  /** Element type of the required ARRAY input. */
  protected def inputElementType: DataType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et == inputElementType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<${inputElementType.simpleString}> input, " +
        s"got ${other.simpleString}")
  }
  /** Java source of the static call, given the evaluated child. */
  protected def kernelCall(ctx: CodegenContext, childVar: String): String
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ${kernelCall(ctx, c)};")
}

/** 64-bit SimHash [hi, lo] of a token array — see [[HashImpl.simhash64]]. */
case class SimHash64(child: Expression) extends HashKernelExpression {
  override def prettyName: String = "simhash64"
  override protected def inputElementType: DataType = StringType
  override def nullSafeEval(toks: Any): Any =
    HashImpl.simhash64(toks.asInstanceOf[ArrayData])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.HashImpl.simhash64($c)"
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Sorted distinct 60-bit md5 shingle keys — [[HashImpl.shingleHashes]]. */
case class ShingleHashes(child: Expression, n: Int) extends HashKernelExpression {
  override def prettyName: String = "shingle_hashes"
  override protected def inputElementType: DataType = StringType
  override def nullSafeEval(toks: Any): Any =
    HashImpl.shingleHashes(toks.asInstanceOf[ArrayData], n)
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.HashImpl.shingleHashes($c, $n)"
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Per-document Gopher repetition stats — [[HashImpl.gopherStats]]. */
case class GopherStats(child: Expression) extends HashKernelExpression {
  override def prettyName: String = "gopher_stats"
  override protected def inputElementType: DataType = StringType
  override def nullSafeEval(toks: Any): Any =
    HashImpl.gopherStats(toks.asInstanceOf[ArrayData])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.HashImpl.gopherStats($c)"
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

/** Hashed unigram+bigram feature buckets — [[HashImpl.gramBuckets]]. */
case class GramBuckets(child: Expression) extends HashKernelExpression {
  override def prettyName: String = "gram_buckets"
  override protected def inputElementType: DataType = StringType
  override def nullSafeEval(toks: Any): Any =
    HashImpl.gramBuckets(toks.asInstanceOf[ArrayData])
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.HashImpl.gramBuckets($c)"
  override protected def withNewChildInternal(newChild: Expression): GramBuckets =
    copy(child = newChild)
}

/** MinHash signature over shingle keys — [[HashImpl.minhashSig]]. */
case class MinHashSig(child: Expression, numHashes: Int)
  extends HashKernelExpression {
  override def prettyName: String = "minhash_sig"
  override protected def inputElementType: DataType = LongType
  override def nullSafeEval(khs: Any): Any =
    HashImpl.minhashSig(khs.asInstanceOf[ArrayData], numHashes)
  override protected def kernelCall(ctx: CodegenContext, c: String): String =
    s"graft.functions.HashImpl.minhashSig($c, $numHashes)"
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** LSH bucket array of an embedding for `tables`×`bits` deterministic
  * md5-Rademacher hyperplanes — [[HashImpl.lshBuckets]]. Planes are
  * derived from (tables, bits) only, so expression equality (and plan
  * canonicalization) works structurally.
  */
case class LshBuckets(child: Expression, tables: Int, bits: Int)
  extends HashKernelExpression {
  @transient private lazy val planes = graft.operators.AnnLsh.hyperplanes(tables, bits)
  override def prettyName: String = "lsh_buckets"
  override protected def inputElementType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    HashImpl.lshBuckets(v.asInstanceOf[ArrayData], planes)
  override protected def kernelCall(ctx: CodegenContext, c: String): String = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][][]")
    s"graft.functions.HashImpl.lshBuckets($c, $ref)"
  }
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object HashExpressions {
  import GraftSqlBridge.{column, expression}

  def simhash64(toks: Column): Column = column(SimHash64(expression(toks)))
  def shingleHashes(toks: Column, n: Int): Column =
    column(ShingleHashes(expression(toks), n))
  def gopherStats(toks: Column): Column = column(GopherStats(expression(toks)))
  def gramBuckets(toks: Column): Column = column(GramBuckets(expression(toks)))
  def minhashSig(khs: Column, numHashes: Int): Column =
    column(MinHashSig(expression(khs), numHashes))
  def lshBuckets(v: Column, tables: Int, bits: Int): Column =
    column(LshBuckets(expression(v), tables, bits))
  def bloomBitPositions(s: Column, k: Int, m: Int): Column =
    column(BloomBitPositions(expression(s), k, m))
  def wordShingles(toks: Column, n: Int): Column =
    column(WordShingles(expression(toks), n))
  def boundedLev1(a: Column, b: Column): Column =
    column(BoundedLev1(expression(a), expression(b)))
  def whitespaceTokens(text: Column): Column =
    column(WhitespaceTokens(expression(text)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    column(SortedIntersectCount(expression(a), expression(b)))

  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  /** Make the kernels callable from `spark.sql` — registered as the
    * native expressions themselves (stay codegen'd), not UDF
    * wrappers. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    GraftSqlBridge.registerFunction(spark, "simhash64",
      es => SimHash64(es.head))
    GraftSqlBridge.registerFunction(spark, "shingle_hashes",
      es => ShingleHashes(es(0), intLit(es(1), "shingle_hashes")))
    GraftSqlBridge.registerFunction(spark, "gopher_stats",
      es => GopherStats(es.head))
    GraftSqlBridge.registerFunction(spark, "gram_buckets",
      es => GramBuckets(es.head))
    GraftSqlBridge.registerFunction(spark, "minhash_sig",
      es => MinHashSig(es(0), intLit(es(1), "minhash_sig")))
    GraftSqlBridge.registerFunction(spark, "lsh_buckets",
      es => LshBuckets(es(0), intLit(es(1), "lsh_buckets"),
        intLit(es(2), "lsh_buckets")))
    GraftSqlBridge.registerFunction(spark, "array_dot",
      es => ArrayDotProduct(es(0), es(1)))
    GraftSqlBridge.registerFunction(spark, "sorted_intersect_count",
      es => SortedIntersectCount(es(0), es(1)))
    GraftSqlBridge.registerFunction(spark, "word_shingles",
      es => WordShingles(es(0), intLit(es(1), "word_shingles")))
    GraftSqlBridge.registerFunction(spark, "ws_tokens",
      es => WhitespaceTokens(es.head))
    GraftSqlBridge.registerFunction(spark, "bounded_lev1",
      es => BoundedLev1(es(0), es(1)))
  }
}
