package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity-resolution fuzzy join: match a "dirty" name registry against
  * the clean one within Levenshtein distance 1, WITHOUT a cross join.
  *
  * Blocking is the FastSS deletion-neighborhood scheme (Bocek et al.,
  * "Fast Similarity Search in Large Dictionaries", 2007): each side
  * emits the string itself plus every single-character deletion as
  * blocking signatures, candidates are the equi-join on the signature,
  * and an exact `levenshtein` confirms. Completeness for distance <= 1
  * is the scheme's classic argument:
  *   - equal strings share the identity signature;
  *   - one substitution at position i: both sides' delete-at-i
  *     signatures are equal;
  *   - one insertion/deletion: deleting the inserted character on the
  *     longer side yields exactly the shorter side's identity
  *     signature.
  * Collisions admit pairs up to distance 2 (delete+insert), so the
  * confirm filter is required, and bucket sizes stay tiny — a bucket
  * holds only strings identical after one deletion.
  *
  * The dirty side is derived deterministically in the query itself
  * (the [[TextQueries.piiScrub]] planted-fixture pattern): every third
  * customer's name gets one digit bumped (mod 10, position keyed by
  * the custkey), so the match set is rich — every dirty row finds its
  * own clean row at distance 0 or 1, bumped names that land on another
  * live key also match that entity at distance 0, and low keys pick up
  * genuine distance-1 neighbors ("Customer#000000005" vs #15, #105,
  * ...). The oracle runs the EXHAUSTIVE O(n^2) definition (cross join
  * + levenshtein filter) in DuckDB, so the gate proves the blocked
  * plan equals the brute-force semantics, recall included.
  *
  * Scale: signature explode is a linear ~(L+1)x row amplification
  * (L = name length), the join is a plain shuffled equi-join on the
  * signature string, and confirm work is proportional to true
  * candidates — no O(n^2) stage anywhere. Buckets are skew-proof by
  * construction (8-of-9-digit agreement), and AQE handles the residual
  * size variance. Reference analogue: the reference's dedup/matching
  * surface covers record-level similarity; this is the same operator
  * class expressed as Spark-native blocking + builtin confirm.
  */
object EntityResolution {

  /** One digit bumped (mod 10) at a custkey-derived position, for
    * every third customer — the deterministic "dirty registry".
    * Expressed with ascii/chr/substring only so the oracle replays it
    * bit-for-bit in DuckDB. */
  private val dirtyNameSql: String =
    """CASE WHEN c_custkey % 3 = 0 THEN
      |  substring(c_name, 1, CAST(9 + c_custkey % 9 AS INT)) ||
      |  chr(48 + (ascii(substring(c_name, CAST(10 + c_custkey % 9 AS INT), 1)) - 48 + 1) % 10) ||
      |  substring(c_name, CAST(11 + c_custkey % 9 AS INT))
      |ELSE c_name END""".stripMargin

  /** Identity + all single-deletion signatures of a string column —
    * the FastSS k=1 neighborhood. array_distinct because deleting
    * either of two equal adjacent characters yields the same string. */
  private def deletionSigs(c: String): Column = expr(
    s"""array_distinct(concat(array($c),
       |  transform(sequence(1, length($c)),
       |    i -> concat(substring($c, 1, i - 1), substring($c, i + 1)))))"""
      .stripMargin)

  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    val dirty = base.select(col("c_custkey").as("src_id"),
      expr(dirtyNameSql).as("dname"))
    val clean = base.select(col("c_custkey").as("match_id"),
      col("c_name").as("cname"))
    val dsig = dirty.select(col("src_id"), col("dname"),
      explode(deletionSigs("dname")).as("sig"))
    val csig = clean.select(col("match_id"), col("cname"),
      explode(deletionSigs("cname")).as("sig"))
    dsig.join(csig, "sig")
      // a pair collides once per shared signature (equal strings share
      // them all) — dedup BEFORE the confirm so levenshtein runs once
      // per candidate pair
      .select(col("src_id"), col("match_id"), col("dname"), col("cname"))
      .distinct()
      .filter(levenshtein(col("dname"), col("cname")) <= 1)
      .select(col("src_id"), col("match_id"),
        levenshtein(col("dname"), col("cname")).cast("long").as("dist"),
        (col("src_id") === col("match_id")).as("same_entity"))
      .orderBy(col("src_id"), col("match_id"))
  }

  val fuzzyMatchSql: String =
    s"""WITH dirty AS (
       |  SELECT c_custkey AS src_id, $dirtyNameSql AS dname FROM customer),
       |clean AS (SELECT c_custkey AS match_id, c_name AS cname FROM customer)
       |SELECT src_id, match_id,
       |  CAST(levenshtein(dname, cname) AS BIGINT) AS dist,
       |  src_id = match_id AS same_entity
       |FROM dirty CROSS JOIN clean
       |WHERE levenshtein(dname, cname) <= 1
       |ORDER BY src_id, match_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_fuzzy_match" -> (fuzzyMatch _))

  val oracles: Map[String, String] = Map(
    "er_fuzzy_match" -> fuzzyMatchSql)
}
