package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic sketch operators. A sketch earns its keep at 100 TB
  * by replacing the per-key shuffle with a FIXED-SIZE one: the
  * count-min sketch below aggregates word occurrences into d·w = 256
  * cells — a 256-row shuffle regardless of corpus size — instead of a
  * per-word aggregation over an unbounded vocabulary. The hash family
  * is md5-derived (salt j prepended), so the sketch — including its
  * characteristic collision OVERESTIMATES — is bit-identical in any
  * engine and the whole operator is exactly oracle-checkable; Spark's
  * native approx sketches (HLL++, KLL) trade that determinism away.
  */
object SketchQueries {

  private val D = 4 // hash rows
  private val W = 64 // buckets per row

  /** CMS bucket of `word` under salt `j`: first 8 md5 hex digits of
    * "j:word" mod W — the [[CurationQueries]] md5-sampling pattern. */
  private def bucket(j: Int, word: Column): Column =
    conv(substring(md5(concat(lit(s"$j:"), word).cast("binary")), 1, 8),
      16, 10).cast("long") % W

  private def cellsOf(word: Column): Column =
    explode(array((0 until D).map(j =>
      struct(lit(j).as("j"), bucket(j, word).as("b"))): _*))

  /** Heavy hitters via count-min: estimate = min over the d cells a
    * word hashes to; report every word whose estimate clears the
    * threshold next to its exact count (the sketch-then-exact-verify
    * composition a production pipeline runs — the exact pass touches
    * only the sketch's survivors). Overestimates from bucket
    * collisions are part of the contract and of the oracle. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val w = Tables.documents(s, dir)
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
    val cells = w.select(cellsOf(col("word")).as("c"))
      .groupBy(col("c.j").as("j"), col("c.b").as("b"))
      .agg(count(lit(1)).as("cnt"))
    val vocabBuckets = w.distinct()
      .select(col("word"), cellsOf(col("word")).as("c"))
      .select(col("word"), col("c.j").as("j"), col("c.b").as("b"))
    val est = vocabBuckets.join(broadcast(cells), Seq("j", "b"))
      .groupBy(col("word")).agg(min(col("cnt")).as("est"))
    val truth = w.groupBy(col("word")).agg(count(lit(1)).as("true_n"))
    est.join(truth, Seq("word"))
      .filter(col("est") >= 500)
      .select(col("word"), col("est"), col("true_n"))
      .orderBy(col("est").desc, col("word"))
  }

  val cmsHeavyHittersSql: String =
    """WITH occ AS (
      |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      |  FROM documents),
      |w AS (SELECT word FROM occ WHERE length(word) > 0),
      |cells AS (
      |  SELECT j,
      |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || word), 1, 8)) AS BIGINT) % 64 AS b,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM w, range(4) r(j) GROUP BY 1, 2),
      |vocab AS (SELECT DISTINCT word FROM w),
      |vb AS (
      |  SELECT word, j,
      |    CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || word), 1, 8)) AS BIGINT) % 64 AS b
      |  FROM vocab, range(4) r(j)),
      |est AS (
      |  SELECT word, MIN(cnt) AS est FROM vb JOIN cells USING (j, b) GROUP BY word),
      |truth AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS true_n FROM w GROUP BY word)
      |SELECT word, est, true_n FROM est JOIN truth USING (word)
      |WHERE est >= 500
      |ORDER BY est DESC, word""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_cms_heavy_hitters" -> (cmsHeavyHitters _))

  val oracles: Map[String, String] = Map(
    "t_cms_heavy_hitters" -> cmsHeavyHittersSql)
}
