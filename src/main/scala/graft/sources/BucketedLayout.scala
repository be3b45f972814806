package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Write-side bucketing: the shuffle-elimination lever for repeated
  * large-table joins and aggregations.
  *
  * At 100 TB the dominant cost of `orders ⋈ lineitem` is the exchange
  * of both sides on the join key — re-paid by EVERY query that joins
  * them. Bucketed tables pay that partitioning ONCE at write time:
  * each side is hash-clustered into the same number of buckets on its
  * join key (Spark's bucket function is the same murmur3
  * `HashPartitioning` a shuffle would use), so a later equi-join reads
  * bucket i of both sides into the same task and joins with ZERO
  * exchange, and a `groupBy` on the bucket key aggregates with zero
  * exchange too. This is the batch analog of the reference's
  * keyed-state co-location: the key→partition assignment is persisted
  * with the data instead of recomputed per query.
  *
  * Spark only honors bucket metadata through the catalog, so the
  * copies are written with `saveAsTable` (files under an explicit
  * scratch location, metadata in the session catalog). Each side is
  * `repartition`ed onto its bucket key first — bucketed writers emit
  * one file per (task, bucket), so without it N tasks × B buckets
  * explodes into N·B small files, the classic bucketing trap at
  * scale; with it each task owns exactly one bucket.
  *
  * The result of a query over the bucketed copies is row-identical to
  * the same query over the raw parquet (bucketing is pure layout), so
  * the oracle runs the plain-join SQL; `BucketedLayoutSpec`
  * additionally pins the plan property (no shuffle exchange under the
  * join) that is the entire point.
  */
object BucketedLayout {

  /** Bucket count: 8 covers local testing; production tuning is
    * buckets ≈ table size / target task input (for 100 TB of lineitem
    * at 256 MB/task, thousands — set once at layout time). */
  def bucketCount(s: SparkSession): Int =
    s.conf.getOption("spark.graft.buckets").map(_.toInt).getOrElse(8)

  /** Ensure bucketed copies of orders and lineitem exist for `dir`;
    * returns (ordersTable, lineitemTable) catalog names. Memoized per
    * (session, dir, table mtime): one write, reused by every
    * subsequent query in the session — the cost model that makes
    * write-side bucketing pay for itself. */
  def ensureBucketed(s: SparkSession, dir: String): (String, String) =
    Tables.memoizedAtConstruction(s, dir, "lineitem", "bucketed") {
      val n = bucketCount(s)
      // table names carry the exact-dir digest (two corpora in one
      // session must not collide) and the session identity (catalog
      // names are session-scoped but the scratch files are not)
      val exact = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val sid = Integer.toHexString(System.identityHashCode(s))
      val ot = s"graft_orders_b_${exact}_$sid"
      val lt = s"graft_lineitem_b_${exact}_$sid"
      def write(df: DataFrame, key: String, table: String,
          srcTable: String): Unit =
        df.repartition(n, col(key))
          .write.mode(SaveMode.Overwrite).format("parquet")
          .option("path", Tables.scratchDir(s, dir, srcTable, s"bucket$n"))
          .bucketBy(n, key).sortBy(key)
          .saveAsTable(table)
      write(Tables.orders(s, dir), "o_orderkey", ot, "orders")
      write(Tables.lineitem(s, dir), "l_orderkey", lt, "lineitem")
      (ot, lt)
    }

  /** Oracle-gated query over the bucketed copies: order-priority
    * revenue rollup through the `orders ⋈ lineitem` join. Over raw
    * parquet this plan exchanges ~all of lineitem; over the bucketed
    * copies the join itself is exchange-free (only the 5-row priority
    * rollup shuffles). Results are layout-independent, so the oracle
    * is the plain join. */
  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (ot, lt) = ensureBucketed(s, dir)
    val dec = "decimal(18,2)"
    s.table(ot).join(s.table(lt),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(dec) *
            (lit(1).cast(dec) - col("l_discount").cast(dec)))
          .cast("double").as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  val bucketedJoinSql: String =
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
      |    AS DOUBLE) AS revenue
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_bucketed_join" -> (bucketedJoin _))

  val oracles: Map[String, String] = Map(
    "layout_bucketed_join" -> bucketedJoinSql)
}
