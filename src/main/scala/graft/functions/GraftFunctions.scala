package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level building blocks shared by the operator layer.
  *
  * All of these compose built-in (codegen'd) Catalyst expressions —
  * no Scala UDFs in hot paths.
  */
object GraftFunctions {

  /** Key-group assignment, the routing unit of the reference's control
    * plane: `keyGroup = murmur(key.hashCode) % maxParallelism` with
    * maxParallelism defaulting to 128
    * (reference: flink-runtime/.../state/KeyGroupRangeAssignment.java:60-76,
    * DEFAULT_LOWER_BOUND_MAX_PARALLELISM at :31).
    *
    * Spark's `hash()` is Murmur3 x86_32, so `pmod(hash(col), n)` is the
    * direct analog and stays inside whole-stage codegen.
    */
  def keygroup(key: Column, maxParallelism: Int = 128): Column =
    pmod(hash(key), lit(maxParallelism))

  /** Contiguous range assignment of key-groups to `parallelism` operator
    * instances (KeyGroupRangeAssignment.computeOperatorIndexForKeyGroup).
    * INTEGER division (`div`), not Column `/` — the latter is double
    * division and would yield fractional "task indices". */
  def keygroupToTask(kg: Column, maxParallelism: Int, parallelism: Int): Column =
    floor((kg * parallelism) / maxParallelism).cast("int")

  /** Dot product of two equal-length ARRAY<DOUBLE> columns, accumulated
    * left-to-right in double (deterministic order ⇒ reproducible to the
    * bit across engines). Backed by a codegen'd native expression; the
    * accumulation order matches the HOF fold and DuckDB list_reduce. */
  def dotProduct(a: Column, b: Column): Column =
    VectorExpressions.arrayDot(a, b)

  /** L2 norm (same sequential-fold determinism as dotProduct). */
  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity between two embedding arrays. */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Slice of an md5 HEX-string column as an exact LONG: the shared
    * definition behind the engine's deterministic uniform "coins"
    * (hash sampling, mixture rebalance coins, shard keys, sketch cell
    * indices, IVF sample gates). Every caller's DuckDB oracle twin
    * restates it as `CAST(('0x' || substr(md5(x), start, digits)) AS
    * BIGINT)`, so the Spark side must stay bit-identical — one
    * definition, not a hand-rolled copy per operator (each copy is an
    * independent chance to drift on substring width, radix, or the
    * cast-to-binary). ≤15 hex digits fits a long exactly. */
  def hexSliceLong(hex: Column, start1: Int, digits: Int): Column = {
    require(digits >= 1 && digits <= 15,
      s"hexSliceLong needs 1..15 hex digits (got $digits): 16 digits " +
        "can exceed Long.MaxValue and conv() would saturate")
    conv(substring(hex, start1, digits), 16, 10).cast("long")
  }

  /** The md5-fraction coin over an id/value column: first `digits`
    * hex chars of md5(CAST(c AS STRING)) as a long — uniform,
    * reproducible across engines/retries/partitionings (unlike
    * rand()), which is what makes sampled subsets auditable. */
  def md5CoinLong(c: Column, digits: Int = 8): Column =
    hexSliceLong(md5(c.cast("string").cast("binary")), 1, digits)

  /** Whitespace tokenizer shared by the text-analysis operators — the
    * native byte-scan kernel ([[HashExpressions.whitespaceTokens]]),
    * byte-exact to the `split(trim(text), "\\s+")` regex form it
    * replaced (Java `\s` is six ASCII bytes; spec-pinned equivalence
    * incl. leading/trailing-empty-field regex semantics). The regex
    * split was the single hottest scalar in the text family: every
    * operator tokenizes, and Pattern.split costs ~4 s per corpus pass
    * at the 500k-doc scale set vs <1 s for the byte scan.
    *
    * Corpus contract note: Java `\s` includes vertical tab (0x0B)
    * which RE2 — DuckDB's `string_split_regex('\s+')` — does NOT, so
    * a 0x0B byte in a document would tokenize differently in the two
    * engines. The driver fixtures never emit 0x0B; a corpus that does
    * needs a normalization pass (strip/replace 0x0B) ahead of the
    * text operators for the oracles to stay comparable. */
  def tokens(text: Column): Column = HashExpressions.whitespaceTokens(text)

  /** Word n-gram shingles (space-joined) from a token array column —
    * the native one-pass kernel ([[HashExpressions.wordShingles]]);
    * an earlier sequence→transform→slice→concat_ws→filter pipeline
    * interpreted a lambda and allocated a slice per gram, and this
    * call sat in the hottest loop of the whole text family (the
    * bigram/shingle stream is corpus-sized). Byte-identical output. */
  def shinglesOfTokens(toks: Column, n: Int): Column =
    HashExpressions.wordShingles(toks, n)

  /** Word n-gram shingles of a text column — convenience form. (With
    * the native kernels each expression evaluates its child once per
    * row, so composing tokenize+shingle inline costs the same as
    * projecting the token array first.) */
  def shingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** Register SQL-callable forms for spark.sql users. The scalar
    * `keygroup` UDF delegates to the control plane's ONE scalar
    * implementation (`KeygroupRouter.keygroup`, string-byte Murmur3 —
    * what the live pipelines route with), so a SQL caller can never
    * get assignments that disagree with the control plane. An earlier
    * version here hand-rolled Murmur3-of-Long, which hashes a numeric
    * key differently from the router's UTF-8-byte form. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("keygroup",
      (k: String, n: Int) => graft.controlplane.KeygroupRouter.keygroup(k, n))
  }
}
