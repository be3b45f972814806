package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering: interleave the bits of two
  * clustering keys so that range-partitioning on the combined value
  * co-locates rows that are close in BOTH dimensions. A linear sort
  * clusters one column perfectly and leaves the other scattered over
  * every file; the z-curve trades a little locality on the first
  * dimension for min/max footer ranges that prune on both — at 100 TB
  * that is the difference between scanning one dimension's slice and
  * skipping most row groups for any 2-D predicate (the standard
  * lakehouse OPTIMIZE ZORDER BY layout).
  *
  * Everything here is column arithmetic inside codegen (literal-shift
  * masks), and the write path is plain
  * repartitionByRange + sortWithinPartitions — no custom committer.
  */
object ZOrderLayout {

  /** Morton value of two non-negative long columns, MSB-ALIGNED: the
    * most significant meaningful bit of each key lands at the top of
    * the z-value regardless of the domains' widths. Interleaving by
    * raw bit position instead (the naive form) puts only the WIDER
    * key's bits in the top positions whenever the domains differ in
    * magnitude — the narrow key's high "bits" are constant zeros —
    * and the curve degenerates to a linear sort on the wide key.
    * `aBits`/`bBits` are the keys' domain widths (⌈log2 max⌉). */
  def zValue(a: Column, b: Column, aBits: Int, bBits: Int): Column = {
    // Java shift distances wrap mod 64: widths summing past 63 would
    // SILENTLY fold high interleaved bits onto low positions and the
    // layout would prune on neither dimension — fail loudly instead
    require(aBits > 0 && bBits > 0 && aBits + bBits <= 63,
      s"zValue needs positive widths with aBits + bBits <= 63 " +
        s"(got $aBits + $bBits): a 64-bit long cannot hold the " +
        "interleaved value and shiftleft wraps mod 64")
    var pos = aBits + bBits
    val terms = Seq.newBuilder[Column]
    // pair by RELATIVE significance (i-th most significant bit of each
    // key), not by absolute bit index — absolute pairing would put the
    // wider key's extra high bits above every bit of the narrow key
    for (i <- 0 until math.max(aBits, bBits)) {
      if (i < aBits) {
        pos -= 1
        terms += shiftleft(
          shiftright(a, aBits - 1 - i).bitwiseAND(lit(1L)), pos)
      }
      if (i < bBits) {
        pos -= 1
        terms += shiftleft(
          shiftright(b, bBits - 1 - i).bitwiseAND(lit(1L)), pos)
      }
    }
    terms.result().reduce(_ bitwiseOR _)
  }

  /** Write `df` as `nFiles` parquet files clustered on the z-curve of
    * (a, b). Range partitioning on the Morton value balances file
    * sizes from a sample; the within-partition sort tightens each
    * file's min/max footer ranges on both keys. */
  def writeZOrdered(df: DataFrame, a: String, b: String, path: String,
      nFiles: Int, aBits: Int = 16, bBits: Int = 16): Unit =
    df.withColumn("_zorder", zValue(col(a), col(b), aBits, bBits))
      .repartitionByRange(nFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
      .write.mode("overwrite").parquet(path)

  /** Linear baseline: the same file count, sorted on `a` alone. */
  def writeLinear(df: DataFrame, a: String, path: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(a))
      .sortWithinPartitions(a)
      .write.mode("overwrite").parquet(path)
}
