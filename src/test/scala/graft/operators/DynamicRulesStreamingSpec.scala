package graft.operators

import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.model.Rule

/** Streaming rules evaluation: the rule set is consulted per
  * micro-batch, so control-stream transitions (ACTIVE/PAUSE) apply at
  * the next trigger without a restart. */
class DynamicRulesStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  case class Ev(ts: Timestamp, user_id: Long, value: Double)

  test("rules parse from JSON control messages") {
    val parsed = DynamicRules.parseRules(spark, Seq(
      """{"ruleId":7,"ruleState":"ACTIVE","groupingKeyNames":["user_id"],
        |"aggregateFieldName":"value","aggregatorFunctionType":"SUM",
        |"limitOperatorType":">","limit":42.5,"windowMinutes":30}"""
        .stripMargin.replace("\n", "")))
    assert(parsed === Seq(Rule(7, "ACTIVE", Seq("user_id"), "value",
      "SUM", ">", BigDecimal("42.5"), 30)))
  }

  test("rule transitions apply at the next micro-batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    @volatile var rules: Seq[Rule] = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(100), 60))
    val alerts = new ConcurrentLinkedQueue[Row]()
    val q = DynamicRules.streaming(in.toDF(), () => rules,
      (df, _) => df.collect().foreach(alerts.add))
    try {
      def ev(sec: Long, user: Long, v: Double) =
        Ev(new Timestamp(sec * 1000), user, v)
      in.addData(ev(100, 1, 150.0), ev(101, 2, 50.0))
      q.processAllAvailable()
      // rule 1 fires for user 1 only
      assert(alerts.asScala.map(_.getString(2)).toSet === Set("1"))

      // control message: pause rule 1, activate a MAX rule
      rules = Seq(
        Rule(1, "PAUSE", Seq("user_id"), "value", "SUM", ">",
          BigDecimal(100), 60),
        Rule(2, "ACTIVE", Seq("user_id"), "value", "MAX", ">=",
          BigDecimal(200), 60))
      alerts.clear()
      in.addData(ev(200, 3, 250.0), ev(201, 4, 150.0))
      q.processAllAvailable()
      val byRule = alerts.asScala.groupBy(_.getLong(0))
      assert(!byRule.contains(1L), "paused rule still fired")
      assert(byRule(2L).map(_.getString(2)).toSet === Set("3"))
    } finally q.stop()
  }

  test("rendered-key collisions stay separate groups (batch-raw parity)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // six distinct raw (k1, k2) tuples that concat_ws renders onto
    // three strings — the accumulator must key on the raw tuple (like
    // the batch twin's groupBy on raw columns), not the rendering
    val rules = Seq(Rule(1, "ACTIVE", Seq("k1", "k2"), "value", "SUM",
      ">", BigDecimal(0), 60))
    def tev(sec: Long, k1: String, k2: String, v: Double) = (
      new Timestamp(sec * 1000), k1, k2, v)
    val events = Seq(
      tev(100, null, "x", 5.0), tev(200, "x", null, 7.0),
      tev(300, "", null, 11.0), tev(400, null, null, 13.0),
      tev(500, "a|b", "c", 17.0), tev(600, "a", "b|c", 19.0))
    val cols = Seq("ts", "k1", "k2", "value")
    val expected = DynamicRules
      .evaluate(events.toDF(cols: _*), rules)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3))).toSet
    assert(expected.size === 6 && expected.map(_._3).size === 3,
      s"collision fixture broken: $expected")
    val in = MemoryStream[(Timestamp, String, String, Double)]
    val alerts = new ConcurrentLinkedQueue[Row]()
    val q = DynamicRules.streaming(in.toDF().toDF(cols: _*),
      () => rules, (df, _) => df.collect().foreach(alerts.add))
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val got = alerts.asScala.map(r => (r.getLong(0), r.getString(1),
        r.getString(2), r.getDouble(3))).toSet
      assert(got === expected)
    } finally q.stop()
  }

  test("re-delivered batchId is skipped; failed sink replays cleanly") {
    // foreachBatch is at-least-once: the handler must (a) not
    // double-merge a batch re-delivered under a committed batchId,
    // and (b) leave the accumulator untouched when the sink throws,
    // so the retry recomputes identical alerts instead of inflating
    import org.apache.spark.sql.types._
    val rules: Seq[Rule] = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(700), 60))
    val alerts = new ConcurrentLinkedQueue[Row]()
    @volatile var failSink = false
    val handle = DynamicRules.batchHandler(() => rules, (df, _) => {
      if (failSink) throw new RuntimeException("sink down")
      df.collect().foreach(alerts.add)
    })
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    def batch(sec: Long, v: Double) =
      spark.createDataFrame(
        java.util.Arrays.asList(Row(new Timestamp(sec * 1000), 1L, v)),
        schema)

    handle(batch(100, 400.0), 0L) // partial: no alert
    handle(batch(100, 400.0), 0L) // RE-DELIVERY of batch 0: must skip
    assert(alerts.isEmpty,
      "re-delivered batch inflated the accumulator to 800 and fired")

    // sink failure mid-batch: accumulator must stay at 400
    failSink = true
    intercept[RuntimeException](handle(batch(200, 400.0), 1L))
    failSink = false
    handle(batch(200, 400.0), 1L) // retry of batch 1
    val fired = alerts.asScala.toList
    assert(fired.map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
      === List((1L, "1", 800.0)),
      s"expected exactly one 800.0 alert after the retry, got $fired")
  }

  test("windows accumulate across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val in = MemoryStream[Ev]
    val rules: Seq[Rule] = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(700), 60))
    val alerts = new ConcurrentLinkedQueue[Row]()
    val q = DynamicRules.streaming(in.toDF(), () => rules,
      (df, _) => df.collect().foreach(alerts.add))
    try {
      def ev(sec: Long, user: Long, v: Double) =
        Ev(new Timestamp(sec * 1000), user, v)
      // both batches land in the same 60-minute window; neither alone
      // clears SUM > 700 — a per-batch-only evaluation never fires
      in.addData(ev(100, 1, 400.0))
      q.processAllAvailable()
      assert(alerts.isEmpty, "fired on a 400 partial")
      in.addData(ev(200, 1, 400.0))
      q.processAllAvailable()
      val fired = alerts.asScala.toList
      assert(fired.map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
        === List((1L, "1", 800.0)),
        s"expected one accumulated 800.0 alert, got $fired")
    } finally q.stop()
  }

  test("null values and null ts match the batch twin (no NPE)") {
    import org.apache.spark.sql.types._
    // AVG counts null-value rows in its denominator (count(lit(1)))
    // while SUM/MIN/MAX skip them; an all-null window aggregates to
    // null and fires nothing; a null-ts row is filtered by the window
    // rewrite on BOTH paths. Before the null-aware merge, the first
    // all-null group NPE'd the handler on null.add(...).
    val rules = Seq(
      Rule(1, "ACTIVE", Seq("user_id"), "value", "AVG", "<=",
        BigDecimal(60), 60),
      Rule(2, "ACTIVE", Seq("user_id"), "value", "SUM", ">",
        BigDecimal(-1), 60))
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("value", DoubleType)))
    val rows = java.util.Arrays.asList(
      Row(new Timestamp(100 * 1000L), 1L, java.lang.Double.valueOf(100.0)),
      Row(new Timestamp(200 * 1000L), 1L, null),             // AVG 50 fires
      Row(new Timestamp(300 * 1000L), 4L, null),
      Row(new Timestamp(400 * 1000L), 4L, null),             // all-null: silent
      Row(null, 3L, java.lang.Double.valueOf(10.0)))         // null ts: dropped
    val df = spark.createDataFrame(rows, schema)
    val expected = DynamicRules.evaluate(df, rules).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(expected.exists(a => a._1 == 1L && a._3 == "1" && a._4 == 50.0),
      s"AVG null-count fixture broken: $expected")
    assert(!expected.exists(_._3 == "4"), "all-null window fired in batch")
    assert(!expected.exists(_._3 == "3"), "null-ts row survived in batch")

    val alerts = new ConcurrentLinkedQueue[Row]()
    val handle = DynamicRules.batchHandler(() => rules,
      (a, _) => a.collect().foreach(alerts.add))
    handle(df, 0L)
    val got = alerts.asScala
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .toSet
    assert(got === expected)
    // a SECOND all-null batch merges into committed null state (the
    // commit-side nAdd/nMin/nMax path) without firing or throwing
    alerts.clear()
    handle(spark.createDataFrame(java.util.Arrays.asList(
      Row(new Timestamp(500 * 1000L), 4L, null)), schema), 1L)
    assert(!alerts.asScala.exists(_.getString(2) == "4"))
  }
}
