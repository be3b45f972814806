package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One scored candidate entering the bounded top-k aggregation.
  * `payload` rides along untouched (a label, a packed secondary value —
  * anything the caller wants back for the surviving k rows). */
case class TopKIn(score: Double, id: Long, payload: Long)

/** A surviving candidate, emitted in rank order by [[TopKAggregator]]. */
case class TopKHit(score: Double, id: Long, payload: Long)

/** Bounded per-group top-k as a typed aggregate — the scale-safe finish
  * for every ANN/similarity query.
  *
  * The first form of those queries ranked with
  * `row_number() over Window.partitionBy(qid)`: with 10 query ids that
  * window shuffles EVERY scored candidate row into ≤ 10 tasks and sorts
  * a corpus-sized partition in each — the one remaining
  * O(corpus)-per-task stage on the 100 TB ANN path. This aggregator
  * replaces it with partial aggregation: each map task folds its
  * candidates into a ≤ k-entry buffer per qid (O(k) per row, no sort),
  * the shuffle carries at most tasks × |queries| × k rows, and the
  * final merge per qid touches ≤ tasks × k entries. Same total order as
  * the window (`score` desc-or-asc, then `id` asc — ties are impossible
  * beyond that because `id` is unique), so results are bit-identical.
  *
  * Buffers merge associatively and commutatively (set-union followed by
  * truncation under a total order), so partial/final split and merge
  * order cannot change the survivors. */
final class TopKAggregator(k: Int, desc: Boolean)
  extends Aggregator[TopKIn, Seq[TopKHit], Seq[TopKHit]] {

  /** Strict "ranks before" under the query's total order. */
  private def beats(aScore: Double, aId: Long, b: TopKHit): Boolean =
    if (aScore != b.score) { if (desc) aScore > b.score else aScore < b.score }
    else aId < b.id

  private def worstIndex(b: Seq[TopKHit]): Int = {
    var w = 0
    var i = 1
    while (i < b.size) {
      if (beats(b(w).score, b(w).id, b(i))) w = i
      i += 1
    }
    w
  }

  private def insert(b: Seq[TopKHit], score: Double, id: Long,
      payload: Long): Seq[TopKHit] =
    if (b.size < k) b :+ TopKHit(score, id, payload)
    else {
      val w = worstIndex(b)
      if (beats(score, id, b(w))) b.updated(w, TopKHit(score, id, payload))
      else b
    }

  override def zero: Seq[TopKHit] = Vector.empty

  override def reduce(b: Seq[TopKHit], in: TopKIn): Seq[TopKHit] =
    insert(b, in.score, in.id, in.payload)

  override def merge(a: Seq[TopKHit], b: Seq[TopKHit]): Seq[TopKHit] =
    b.foldLeft(a)((acc, e) => insert(acc, e.score, e.id, e.payload))

  override def finish(b: Seq[TopKHit]): Seq[TopKHit] =
    b.sortWith((x, y) => beats(x.score, x.id, y))

  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[TopKHit]] =
    ExpressionEncoder[Seq[TopKHit]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[TopKHit]] =
    ExpressionEncoder[Seq[TopKHit]]()
}

object TopK {

  /** The aggregate as an untyped column function:
    * `topK(5, desc = true)(scoreCol, idCol, payloadCol)` →
    * `array<struct<score:double, id:bigint, payload:bigint>>` sorted in
    * rank order. */
  def topK(k: Int, desc: Boolean): org.apache.spark.sql.expressions
      .UserDefinedFunction =
    udaf(new TopKAggregator(k, desc), ExpressionEncoder[TopKIn]())

  /** Rank the top `k` candidates per query over a scored frame with
    * columns `qid` and `cid`: returns (qid, rank, cid, <scoreName>)
    * ordered by (qid, rank) — the exact output shape of the
    * row_number-window form it replaces, without the corpus-scale
    * window. `score` must be (or cast exactly to) DOUBLE; integer
    * scores < 2^53 round-trip exactly and can be cast back. */
  def perQueryTopK(scored: DataFrame, score: Column, k: Int,
      desc: Boolean, scoreName: String): DataFrame =
    scored
      .groupBy(col("qid"))
      .agg(topK(k, desc)(score.cast("double"), col("cid"), lit(0L)).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("i", "e")))
      .select(col("qid"), (col("i") + 1).cast("long").as("rank"),
        col("e.id").as("cid"), col("e.score").as(scoreName))
      .orderBy(col("qid"), col("rank"))
}
