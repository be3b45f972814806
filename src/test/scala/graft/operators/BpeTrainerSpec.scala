package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** The distributed BPE trainer must learn exactly the merge sequence
  * a straightforward single-machine BPE produces on the same corpus
  * (greedy left-to-right application, count-desc / lexicographic-asc
  * pair selection). */
class BpeTrainerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  /** Reference implementation on the driver. */
  private def referenceMerges(words: Map[String, Long], n: Int)
      : Seq[(String, String, Long)] = {
    var vocab: Map[Vector[String], Long] =
      words.groupMapReduce(w => w._1.map(_.toString).toVector)(_._2)(_ + _)
    val out = Seq.newBuilder[(String, String, Long)]
    var i = 0
    var done = false
    while (i < n && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((syms, wn) <- vocab; j <- 0 until syms.length - 1)
        counts((syms(j), syms(j + 1))) =
          counts.getOrElse((syms(j), syms(j + 1)), 0L) + wn
      // stop only when NO pair remains — same contract as train()
      // and the oracle's fixed CTE chain (count-1 merges included)
      if (counts.isEmpty) done = true
      else {
        val ((a, b), cnt) = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }
        out += ((a, b, cnt))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          val acc = Vector.newBuilder[String]
          var last: String = null
          for (x <- syms) {
            if (last == a && x == b) {
              val cur = acc.result()
              acc.clear()
              cur.dropRight(1).foreach(acc += _)
              acc += (a + b)
              last = a + b
            } else { acc += x; last = x }
          }
          acc.result()
        }(_._2)(_ + _)
        i += 1
      }
    }
    out.result()
  }

  test("distributed trainer matches the single-machine merge sequence") {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.GraftFunctions.tokens(
          org.apache.spark.sql.functions.col("text"))).as("w"))
      .groupBy("w").count()
      .as[(String, Long)].collect().toMap
    val want = referenceMerges(words, 8)
    val (got, finalVocab) = BpeTrainer.train(spark, dir, 8)
    assert(got === want)
    // the rewritten vocab conserves mass: total word count unchanged
    // and every word's symbols re-concatenate to the word
    val bad = finalVocab.filter(
      org.apache.spark.sql.functions.array_join(
        org.apache.spark.sql.functions.col("symbols"), "") =!=
        org.apache.spark.sql.functions.col("word"))
    assert(bad.count() == 0)
  }
}
