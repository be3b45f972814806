package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.{Auction, Person}

class SymmetricJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def person(id: Long, name: String, state: String) =
    Person(id, name, s"$name@x", "cc", "City", state,
      new Timestamp(0L), "")

  private def auction(id: Long, seller: Long) =
    Auction(id, s"item$id", "", 1, 2, new Timestamp(0L),
      new Timestamp(60000L), seller, 1, "")

  test("auctions buffer until person arrives; later auctions join directly") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ps = MemoryStream[Person]
    val as = MemoryStream[Auction]
    val joined = SymmetricJoin.join(ps.toDS(), as.toDS())
    val q = joined.writeStream.format("memory").queryName("sj")
      .outputMode("append").start()
    try {
      as.addData(auction(1, 1001)) // no person yet: buffered
      q.processAllAvailable()
      assert(spark.table("sj").count() === 0)

      ps.addData(person(1001, "alice", "OR")) // drains the buffer
      q.processAllAvailable()
      assert(spark.table("sj").count() === 1)

      as.addData(auction(2, 1001)) // person present: joins immediately
      q.processAllAvailable()
      val rows = spark.table("sj")
        .as[SymmetricJoin.JoinedEntry].collect().sortBy(_.auctionId).toList
      assert(rows === List(
        SymmetricJoin.JoinedEntry("alice", "City", "OR", 1),
        SymmetricJoin.JoinedEntry("alice", "City", "OR", 2)))
    } finally q.stop()
  }

  test("non-matching person state is filtered (Q3 predicate)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ps = MemoryStream[Person]
    val as = MemoryStream[Auction]
    val q = SymmetricJoin.join(ps.toDS(), as.toDS())
      .writeStream.format("memory").queryName("sj2")
      .outputMode("append").start()
    try {
      ps.addData(person(1002, "bob", "NY")) // not in {OR, ID, CA}
      as.addData(auction(3, 1002))
      q.processAllAvailable()
      assert(spark.table("sj2").count() === 0)
    } finally q.stop()
  }
}
