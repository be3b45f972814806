package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, SparkTestUtil}
import graft.model.Rule
import graft.operators.DynamicRules

/** Event fixture row — top-level so Spark can build its encoder
  * without the test class's outer scope. */
case class RulesTwsEv(ts: Timestamp, user_id: Long, event_type: String,
    value: Double)

/** Nullable-field fixture row (Option → nullable column). */
case class RulesTwsNullEv(ts: Timestamp, user_id: Long,
    value: Option[Double])

/** Fixture with a nullable STRING grouping key. */
case class RulesTwsNullKeyEv(ts: Timestamp, event_type: String,
    value: Double)

/** Fixture with TWO nullable string keys — rendered-key collisions. */
case class RulesTwsTwoKeyEv(ts: Timestamp, k1: String, k2: String,
    value: Double)

/** The transformWithState rules engine: checkpointed window state that
  * SURVIVES a query restart (the reference keeps window aggregates in
  * managed keyed state, megaphone ProcessorFunction.java:127-137 — the
  * foreachBatch twin's driver-memory accumulator cannot). */
class RulesTwsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private type Ev = RulesTwsEv

  private def ev(sec: Long, user: Long, typ: String, v: Double) =
    RulesTwsEv(new Timestamp(sec * 1000), user, typ, v)

  private def runTws(events: DataFrame, rules: () => Seq[Rule])(
      body: (org.apache.spark.sql.streaming.StreamingQuery,
             ConcurrentLinkedQueue[RuleAlert]) => Unit): Unit = {
    val (k, v) = TransformWithStateOps.RocksDbProvider
    SparkTestUtil.withConf(spark, k, v) {
      val out = new ConcurrentLinkedQueue[RuleAlert]()
      val q = RulesTws.alerts(events, rules).writeStream
        .outputMode("append")
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[RuleAlert], _: Long) =>
            b.collect().foreach(out.add)
        }
        .start()
      try body(q, out) finally q.stop()
    }
  }

  test("TWS alerts over one batch == batch evaluate") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // three rule shapes (SUM/AVG/MAX, three windows) over a fixture
    // where each fires for a strict subset of keys
    val rules = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(700), 60),
      Rule(2, "ACTIVE", Seq("event_type"), "value", "AVG", "<=",
        BigDecimal(95), 120),
      Rule(3, "ACTIVE", Seq("event_type"), "value", "MAX", ">=",
        BigDecimal(190), 30))
    val events = Seq(
      ev(100, 1, "view", 400.25), ev(200, 1, "view", 399.80),
      ev(300, 2, "click", 90.00), ev(400, 2, "click", 80.50),
      ev(500, 3, "buy", 195.00), ev(600, 3, "buy", 10.00),
      ev(7200, 1, "view", 50.00))
    val expected = DynamicRules
      .evaluate(events.toDF(), rules)
      .as[RuleAlert].collect().toSet
    assert(expected.nonEmpty && expected.map(_.rule_id).size >= 2,
      s"fixture too weak: $expected")

    val in = MemoryStream[Ev]
    runTws(in.toDF(), () => rules) { (q, out) =>
      in.addData(events: _*) // ONE batch: per-batch alerts == final
      q.processAllAvailable()
      assert(out.asScala.toSet === expected)
    }
  }

  test("window state survives a restart from checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("rules-tws-in").toString
    val ckpt = Files.createTempDirectory("rules-tws-ckpt").toString
    val rules = Seq(Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM",
      ">", BigDecimal(700), 60))
    def events: DataFrame = spark.readStream
      .schema("tssec LONG, user_id LONG, value DOUBLE")
      .json(dir)
      .withColumn("ts", col("tssec").cast("timestamp"))
    def write(name: String, lines: String*): Unit =
      Files.writeString(java.nio.file.Paths.get(s"$dir/$name"),
        lines.mkString("\n") + "\n")

    val (k, v) = TransformWithStateOps.RocksDbProvider
    SparkTestUtil.withConf(spark, k, v) {
      val out = new ConcurrentLinkedQueue[RuleAlert]()
      def run() = RulesTws.alerts(events, () => rules).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[RuleAlert], _: Long) =>
            b.collect().foreach(out.add)
        }
        .start()

      // phase 1: 400 into the [0,3600) window — below the limit
      write("part1.json", """{"tssec":100,"user_id":1,"value":400.0}""")
      val q1 = run()
      q1.processAllAvailable()
      q1.stop()
      assert(out.isEmpty, "fired on a 400 partial")

      // phase 2 arrives while "down"; the restarted query must merge
      // it into the CHECKPOINTED 400 — the foreachBatch twin restarts
      // at zero here and never fires
      write("part2.json", """{"tssec":200,"user_id":1,"value":400.0}""")
      val q2 = run()
      q2.processAllAvailable()
      q2.stop()
      val got = out.asScala.toList
      assert(got === List(RuleAlert(1L, "1970-01-01 00:00", "1", 800.0)),
        s"restart lost the open window: $got")

      // the unbroken run over the same files produces the same set
      val ckpt2 = Files.createTempDirectory("rules-tws-ckpt2").toString
      val out2 = new ConcurrentLinkedQueue[RuleAlert]()
      val q3 = RulesTws.alerts(events, () => rules).writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt2)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[RuleAlert], _: Long) =>
            b.collect().foreach(out2.add)
        }
        .start()
      try {
        q3.processAllAvailable()
        assert(out2.asScala.toSet === got.toSet)
      } finally q3.stop()
    }
  }

  test("null aggregate values and null ts match batch semantics") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // batch twin: sum/min/max SKIP nulls, count(lit(1)) COUNTS them
    // (the AVG denominator); an all-null window aggregates to null and
    // never fires. Null ts: Spark's TimeWindowing rewrite FILTERS
    // null timestamps before the window groupBy — the stream's drop
    // in expand() is exact parity.
    val rules = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "AVG", "<=",
        BigDecimal(60), 60),
      Rule(2, "ACTIVE", Seq("user_id"), "value", "MAX", ">=",
        BigDecimal(90), 60),
      Rule(3, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(-1), 60))
    def nev(sec: Long, user: Long, v: Option[Double]) =
      RulesTwsNullEv(if (sec < 0) null else new Timestamp(sec * 1000),
        user, v)
    val events = Seq(
      nev(100, 1, Some(100.0)), nev(200, 1, None), // AVG 100/2=50 fires
      nev(300, 2, Some(80.0)), nev(400, 2, Some(90.0)), // AVG 85 no
      nev(500, 4, None), nev(600, 4, None),     // all-null: never fires
      nev(-1, 3, Some(10.0)))                   // null ts
    val expected = DynamicRules.evaluate(events.toDF(), rules)
      .as[RuleAlert].collect()
    // the fixture must actually exercise every path
    assert(!expected.exists(_.win_start == null), "null win_start leaked")
    assert(!expected.exists(_.key == "3"),
      "null-ts row survived the batch twin's TimeWindowing filter")
    assert(expected.exists(a => a.rule_id == 1 && a.key == "1" &&
      a.value == 50.0), s"AVG null-count parity fixture broken: " +
      expected.mkString(","))
    assert(!expected.exists(_.key == "4"), "all-null window fired")

    val in = MemoryStream[RulesTwsNullEv]
    runTws(in.toDF(), () => rules) { (q, out) =>
      in.addData(events: _*)
      q.processAllAvailable()
      assert(out.asScala.toSet === expected.toSet)
    }
  }

  test("null grouping keys concatenate like concat_ws (skipped, not \"null\")") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rules = Seq(Rule(1, "ACTIVE", Seq("event_type"), "value", "SUM",
      ">", BigDecimal(0), 60))
    val events = Seq(
      RulesTwsNullKeyEv(new Timestamp(100 * 1000L), null, 5.0),
      RulesTwsNullKeyEv(new Timestamp(200 * 1000L), null, 7.0),
      RulesTwsNullKeyEv(new Timestamp(300 * 1000L), "view", 3.0))
    val expected = DynamicRules.evaluate(events.toDF(), rules)
      .as[RuleAlert].collect().toSet
    // batch groups null keys separately and concat_ws renders "" —
    // the null group must exist with the EMPTY key, not "null"
    assert(expected.map(_.key) === Set("", "view"),
      s"batch twin fixture broken: $expected")
    val in = MemoryStream[RulesTwsNullKeyEv]
    runTws(in.toDF(), () => rules) { (q, out) =>
      in.addData(events: _*)
      q.processAllAvailable()
      assert(out.asScala.toSet === expected)
    }
  }

  test("rendered-key collisions stay separate groups (batch-raw parity)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // the batch twin groups by the RAW key columns and renders
    // afterwards; concat_ws renders these six DISTINCT raw tuples onto
    // only three strings — (null,"x")/("x",null) → "x",
    // ("",null)/(null,null) → "", ("a|b","c")/("a","b|c") → "a|b|c" —
    // so a stream grouping on the rendered string would merge them
    val rules = Seq(Rule(1, "ACTIVE", Seq("k1", "k2"), "value", "SUM",
      ">", BigDecimal(0), 60))
    def tev(sec: Long, k1: String, k2: String, v: Double) =
      RulesTwsTwoKeyEv(new Timestamp(sec * 1000), k1, k2, v)
    val events = Seq(
      tev(100, null, "x", 5.0), tev(200, "x", null, 7.0),
      tev(300, "", null, 11.0), tev(400, null, null, 13.0),
      tev(500, "a|b", "c", 17.0), tev(600, "a", "b|c", 19.0))
    val expected = DynamicRules.evaluate(events.toDF(), rules)
      .as[RuleAlert].collect().toSet
    // six groups (six values), only three rendered keys: the fixture
    // genuinely collides
    assert(expected.size === 6 && expected.map(_.key).size === 3,
      s"collision fixture broken: $expected")
    val in = MemoryStream[RulesTwsTwoKeyEv]
    runTws(in.toDF(), () => rules) { (q, out) =>
      in.addData(events: _*)
      q.processAllAvailable()
      assert(out.asScala.toSet === expected)
    }
  }

  test("win_start renders in the session timezone like the batch twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val rules = Seq(Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM",
      ">", BigDecimal(0), 60))
    val events = Seq(ev(7200, 1, "view", 5.0))
    // a half-hour-offset zone catches any hard-pinned UTC formatter
    SparkTestUtil.withConf(spark, "spark.sql.session.timeZone",
        "Asia/Kolkata") {
      val expected = DynamicRules.evaluate(events.toDF(), rules)
        .as[RuleAlert].collect().toSet
      assert(expected.map(_.win_start) === Set("1970-01-01 07:30"),
        s"batch twin rendered $expected")
      val in = MemoryStream[RulesTwsEv]
      runTws(in.toDF(), () => rules) { (q, out) =>
        in.addData(events: _*)
        q.processAllAvailable()
        assert(out.asScala.toSet === expected)
      }
    }
  }

  test("rule transitions apply at the next micro-batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    @volatile var rules: Seq[Rule] = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(100), 60))
    runTws(in.toDF(), () => rules) { (q, out) =>
      in.addData(ev(100, 1, "view", 150.0), ev(101, 2, "view", 50.0))
      q.processAllAvailable()
      assert(out.asScala.map(_.key).toSet === Set("1"))

      rules = Seq(
        Rule(1, "PAUSE", Seq("user_id"), "value", "SUM", ">",
          BigDecimal(100), 60),
        Rule(2, "ACTIVE", Seq("user_id"), "value", "MAX", ">=",
          BigDecimal(200), 60))
      out.clear()
      in.addData(ev(200, 3, "view", 250.0), ev(201, 4, "view", 150.0))
      q.processAllAvailable()
      val byRule = out.asScala.groupBy(_.rule_id)
      assert(!byRule.contains(1L), "paused rule still fired")
      assert(byRule(2L).map(_.key).toSet === Set("3"))
    }
  }
}
