package graft.streaming

import java.math.RoundingMode

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.model.Rule

/** One event joined to one ACTIVE rule: the unit of work the keyed
  * evaluator consumes. Rule parameters (agg type, limit op, limit)
  * travel WITH the row, so the stateful stage is rule-agnostic and a
  * rule edit (new limit) applies to a key from its next arriving
  * element — the reference evaluates per element against the current
  * rule the same way (megaphone ProcessorFunction.java:94-118). */
case class RuleObs(ruleId: Int, winStart: Long, winEnd: Long, key: String,
    gkey: String, ts: java.sql.Timestamp, value: BigDecimal, aggType: String,
    limitOp: String, limit: BigDecimal)

/** Alert row — same shape as [[graft.operators.DynamicRules.evaluate]]
  * output so the twins compare column-for-column. */
case class RuleAlert(rule_id: Long, win_start: String, key: String,
    value: Double)

/** Accumulated per-(rule, window, key) partials. DECIMAL arithmetic
  * end-to-end (the reference accumulates BigDecimal —
  * accumulators/BigDecimalCounter.java et al.). */
case class RuleWindowAcc(sum: BigDecimal, cnt: Long, min: BigDecimal,
    max: BigDecimal)

/** The rules engine on `transformWithState`: per-key window state
  * lives in the CHECKPOINTED state store, so — unlike the
  * foreachBatch accumulator twin ([[graft.operators.DynamicRules
  * .streaming]], whose driver-memory windows die with the query run)
  * — a restart from checkpoint resumes every open window exactly
  * where it stopped. This matches the reference, which keeps the
  * window aggregates in managed keyed state that survives recovery
  * (megaphone ProcessorFunction.java:127-137).
  *
  * Shape: events are expanded to one [[RuleObs]] per ACTIVE rule by a
  * stateless `mapPartitions` that consults `currentRules` once per
  * task per micro-batch — rule ACTIVE/PAUSE transitions therefore
  * apply at the next trigger, preserving the dynamic-rules contract.
  * (`currentRules` must be resolvable ON EXECUTORS: a tiny shared
  * store — a rules file / table — on a cluster; any in-JVM supplier
  * under local mode.) The expansion keys by (ruleId, windowStart,
  * groupKey) and the processor holds one DECIMAL partial tuple per
  * key — state is bounded by (active rules × open windows × keys),
  * the reference's own state shape, and each entry evicts via an
  * EVENT-TIME TIMER when the watermark passes its window end, i.e.
  * the same seal rule as the batch-accumulator twin (winEnd ≤ maxTs −
  * slack, with the slack expressed as the watermark delay). A paused
  * rule's windows stop receiving rows and evict by the same timers
  * (the reference drops them at the next control message — a
  * bounded-state difference only, never a correctness one, since a
  * paused rule emits no alerts either way).
  *
  * Alerts fire on every micro-batch whose accumulated value satisfies
  * the rule — per-element evaluation, the reference's semantics. */
object RulesTws {

  /** Decimal(18,2) coercion matching Spark's `cast(x as decimal(18,2))`
    * (HALF_UP, via the value's canonical string form — Decimal(double)
    * goes through BigDecimal.valueOf, i.e. Double.toString). */
  private[streaming] def toDec(a: Any): BigDecimal = {
    val raw = a match {
      case null => return null
      case d: java.math.BigDecimal => d
      case d: BigDecimal => d.underlying()
      case d: Double => java.math.BigDecimal.valueOf(d)
      case f: Float => java.math.BigDecimal.valueOf(f.toDouble)
      case other => new java.math.BigDecimal(other.toString)
    }
    BigDecimal(raw.setScale(2, RoundingMode.HALF_UP))
  }

  /** Expand each event into one observation per ACTIVE rule. Window
    * starts align to the epoch exactly like `window(ts, "N minutes")`
    * and the grouping key concatenates like `concat_ws("|", ...)`, so
    * the twins bucket identically. */
  private[streaming] def expand(events: DataFrame,
      currentRules: () => Seq[Rule]): Dataset[RuleObs] = {
    implicit val enc = Encoders.product[RuleObs]
    events.mapPartitions { it =>
      val rules = currentRules().filter(_.ruleState == "ACTIVE")
      if (rules.isEmpty) Iterator.empty
      else it.flatMap { row =>
        val ts = row.getTimestamp(row.fieldIndex("ts"))
        // a null event time has no window — drop the row, which is
        // exact parity: the batch twin's TimeWindowing rewrite filters
        // null timestamps before its window groupBy (spec-pinned).
        // Null AGGREGATE values are KEPT:
        // the batch twin's sum/min/max skip them but count(lit(1))
        // counts them (the AVG denominator), so the processor carries
        // them as null-valued observations.
        if (ts == null) Iterator.empty
        else {
          val tsSec = Math.floorDiv(ts.getTime, 1000L)
          rules.iterator.map { r =>
            val w = r.windowMinutes * 60L
            val start = Math.floorDiv(tsSec, w) * w
            val comps = r.groupingKeyNames
              .map(n => row.get(row.fieldIndex(n)))
            // rendered key — concat_ws semantics, exactly: null key
            // components are SKIPPED along with their separator
            // (String.valueOf would render "null" and diverge from the
            // batch twin on any null grouping key). RENDERING ONLY —
            // distinct raw tuples can render identically ((null,"x") vs
            // ("x",null), "" vs null, a literal "|" inside a value), so
            // this string must never be the GROUPING key.
            val key = comps.iterator.filter(_ != null)
              .map(String.valueOf(_)).mkString("|")
            // grouping key — collision-free injective encoding of the
            // raw tuple (null marker + length-prefixed values), so the
            // stream groups exactly like the batch twin's groupBy on
            // the RAW columns and only renders for the alert output
            val gkey = comps.iterator.map {
              case null => "N"
              case c => val v = String.valueOf(c); s"S${v.length}:$v"
            }.mkString
            RuleObs(r.ruleId, start, start + w, key, gkey, ts,
              toDec(row.get(row.fieldIndex(r.aggregateFieldName))),
              r.aggregatorFunctionType, r.limitOperatorType, r.limit)
          }
        }
      }
    }
  }

  /** Keyed evaluator: merges the batch's rows into the stored DECIMAL
    * partials, emits an alert when the accumulated aggregate satisfies
    * the rule, and seals the window (clears state) when its event-time
    * timer fires. */
  final class RuleWindowProcessor(zoneId: String)
    extends StatefulProcessor[(Int, Long, String), RuleObs, RuleAlert] {
    @transient private var acc: ValueState[RuleWindowAcc] = _
    // win_start renders in the SESSION timezone, exactly like the
    // batch twin's date_format — twin parity must not depend on the
    // harness running UTC (the zone travels with the processor)
    @transient private lazy val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm").withZone(java.time.ZoneId.of(zoneId))

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      acc = getHandle.getValueState[RuleWindowAcc]("acc",
        Encoders.product[RuleWindowAcc], TTLConfig.NONE)

    override def handleInputRows(key: (Int, Long, String),
        rows: Iterator[RuleObs], timerValues: TimerValues)
        : Iterator[RuleAlert] = {
      val fresh = !acc.exists()
      var a = if (fresh) null else acc.get()
      var last: RuleObs = null
      // null-valued observations increment cnt only — the batch twin
      // sums/mins/maxes over the non-null values but counts every row
      // (count(lit(1)), the AVG denominator); merging a null into a
      // null-so-far accumulator keeps the field null, so an all-null
      // window aggregates to null and (like the batch twin's null
      // predicate) never fires
      def m2(x: BigDecimal, y: BigDecimal, f: (BigDecimal, BigDecimal) => BigDecimal): BigDecimal =
        if (x == null) y else if (y == null) x else f(x, y)
      rows.foreach { o =>
        last = o
        a = if (a == null) RuleWindowAcc(o.value, 1L, o.value, o.value)
        else RuleWindowAcc(m2(a.sum, o.value, _ + _), a.cnt + 1L,
          m2(a.min, o.value, _ min _), m2(a.max, o.value, _ max _))
      }
      if (last == null) Iterator.empty // key replayed with no rows
      else {
        acc.update(a)
        // seal when the watermark passes window end — the timer fires
        // once event time (minus the watermark slack) clears winEnd
        if (fresh) getHandle.registerTimer(last.winEnd * 1000L)
        val value: java.lang.Double = last.aggType match {
          case "SUM" => if (a.sum == null) null else a.sum.toDouble
          case "AVG" => if (a.sum == null) null else a.sum.toDouble / a.cnt
          case "MIN" => if (a.min == null) null else a.min.toDouble
          case "MAX" => if (a.max == null) null else a.max.toDouble
          case other => throw new IllegalArgumentException(s"agg $other")
        }
        if (value == null) Iterator.empty
        else {
          val v = value.doubleValue()
          val lim = last.limit.toDouble
          val fires = last.limitOp match {
            case "=" => v == lim
            case "!=" => v != lim
            case ">" => v > lim
            case "<" => v < lim
            case ">=" => v >= lim
            case "<=" => v <= lim
            case other => throw new IllegalArgumentException(s"op $other")
          }
          if (fires)
            // the alert carries the RENDERED key (key._3 is the
            // injective grouping encoding); constant within a group —
            // the encoding is injective, so one group = one raw tuple
            Iterator.single(RuleAlert(key._1.toLong,
              fmt.format(java.time.Instant.ofEpochSecond(key._2)),
              last.key, v))
          else Iterator.empty
        }
      }
    }

    override def handleExpiredTimer(key: (Int, Long, String),
        timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[RuleAlert] = {
      acc.clear()
      Iterator.empty
    }
  }

  /** Build the alert stream. `events` needs a `ts` timestamp column
    * plus every ACTIVE rule's grouping and aggregate columns;
    * `lateSlackMinutes` is the out-of-orderness tolerance (the
    * watermark delay — it gates BOTH late-row admission and window
    * seal, the one knob the foreachBatch twin splits in two). Attach
    * `.writeStream.option("checkpointLocation", …)` to make the window
    * state restart-durable; requires the RocksDB state store provider
    * ([[TransformWithStateOps.RocksDbProvider]]). */
  def alerts(events: DataFrame, currentRules: () => Seq[Rule],
      lateSlackMinutes: Int = 0): Dataset[RuleAlert] = {
    val spark = events.sparkSession
    import spark.implicits._
    // NOTE the session timezone is PINNED at query definition (it
    // travels with the processor for the stream's whole life), while
    // the batch twin's date_format re-resolves it per execution — a
    // session-zone change AFTER the stream starts diverges win_start
    // rendering between the twins. Deliberate for a long-lived stream:
    // alerts from one run render in one zone.
    val zone = spark.conf.get("spark.sql.session.timeZone")
    expand(events, currentRules)
      .withWatermark("ts", s"$lateSlackMinutes minutes")
      // group on the collision-free gkey, never the rendered key —
      // rendered-key collisions would merge groups the batch twin
      // (groupBy on raw columns) keeps separate
      .groupByKey(o => (o.ruleId, o.winStart, o.gkey))
      .transformWithState(new RuleWindowProcessor(zone),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
