package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The bounded TopK aggregate must reproduce the
  * `row_number over Window.partitionBy(qid)` total order exactly —
  * including score ties (broken by id asc) — across many partitions,
  * in both sort directions, and carry the payload of exactly the
  * surviving rows. */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixture = {
    import spark.implicits._
    // deterministic scores with deliberate collisions (score = i % 17)
    // so tie-breaking by id is exercised, spread over many partitions
    // so merge() runs
    (0L until 2000L)
      .map(i => (i % 7, i, (i % 17).toDouble, 1000L + i))
      .toDF("qid", "cid", "score", "payload")
      .repartition(16)
  }

  private def windowRef(desc: Boolean) = {
    val w = Window.partitionBy(col("qid"))
      .orderBy(if (desc) col("score").desc else col("score").asc, col("cid"))
    fixture.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("cid"), col("score"))
      .orderBy(col("qid"), col("rank"))
      .collect().toSeq
  }

  test("perQueryTopK matches the window ranking, desc and asc") {
    for (desc <- Seq(true, false)) {
      val got = TopK.perQueryTopK(fixture, col("score"), 5, desc, "score")
        .collect().toSeq
      assert(got == windowRef(desc), s"desc=$desc")
    }
  }

  test("payload rides with the surviving rows") {
    val got = fixture.groupBy(col("qid"))
      .agg(TopK.topK(3, desc = true)(col("score"), col("cid"),
        col("payload")).as("top"))
      .select(col("qid"), explode(col("top")).as("e"))
      .select(col("qid"), col("e.id").as("cid"), col("e.payload").as("payload"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(2) == 1000L + r.getLong(1),
      s"payload decoupled from its row: $r"))
  }

  test("groups smaller than k return all their rows, ranked") {
    import spark.implicits._
    val small = Seq((1L, 10L, 2.0), (1L, 11L, 5.0), (2L, 20L, 1.0))
      .toDF("qid", "cid", "score")
    val got = TopK.perQueryTopK(small, col("score"), 5, desc = true, "score")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 11L), (1L, 2L, 10L), (2L, 1L, 20L)))
  }
}
