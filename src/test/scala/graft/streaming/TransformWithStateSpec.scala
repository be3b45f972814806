package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.KeyedTuple

class TransformWithStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("transformWithState running count accumulates (RocksDB provider)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val (k, v) = TransformWithStateOps.RocksDbProvider
    graft.SparkTestUtil.withConf(spark, k, v) {
      val in = MemoryStream[KeyedTuple]
      val q = TransformWithStateOps.runningCount(in.toDS())
        .writeStream.format("memory").queryName("tws_rc")
        .outputMode("update").start()
      try {
        in.addData(KeyedTuple("a", 1), KeyedTuple("b", 1), KeyedTuple("a", 1))
        q.processAllAvailable()
        in.addData(KeyedTuple("a", 1))
        q.processAllAvailable()
        val last = spark.table("tws_rc").as[KeyedTuple].collect()
          .groupBy(_.key).map { case (key, vs) => key -> vs.map(_.value).max }
        assert(last === Map("a" -> 3L, "b" -> 1L))
      } finally q.stop()
    }
  }
}
