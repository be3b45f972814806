package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Entity-resolution fuzzy join: match a "dirty" name registry against
  * the clean one within Levenshtein distance 1, WITHOUT a cross join.
  *
  * Blocking refines the FastSS deletion-neighborhood scheme (Bocek et
  * al., "Fast Similarity Search in Large Dictionaries", 2007) into
  * three CANDIDATE-EXACT equi-join families. Plain FastSS joins each
  * side's {identity + deletions} signature set against the other's,
  * which is complete for lev ≤ 1 but admits every distance-2
  * delete-one/insert-one collision — on low-entropy keys (zero-padded
  * digit blocks) those false candidates outnumber true pairs by an
  * order of magnitude and dominate the runtime. Splitting by edit type
  * removes them:
  *   1. substitution/equality — masked-position signatures: two
  *      equal-length strings share one iff Hamming distance ≤ 1
  *      (which for equal lengths IS lev ≤ 1: a single insert or
  *      delete cannot preserve length);
  *   2. insertion (clean longer) — dirty identity × clean deletions:
  *      a collision literally exhibits the one-deletion edit;
  *   3. insertion (dirty longer) — dirty deletions × clean identity.
  * Every collision in every family is a true lev ≤ 1 pair, so the
  * `levenshtein` confirm is an assertion rather than a filter, and the
  * join output is proportional to the RESULT size, not to a
  * candidate superset.
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

  /** The full signature set of one side, tag-partitioned so ONE
    * equi-join realizes exactly the three candidate families and
    * nothing else:
    *   - `m:` masked-position signatures (character i replaced by the
    *     out-of-alphabet sentinel \\u0001 — names never contain it).
    *     Two equal-length strings share one iff they agree everywhere
    *     outside the masked position, i.e. iff Hamming distance <= 1 —
    *     candidate-exact for the substitution/equality family, and the
    *     sentinel's position encodes i so a substitution pair collides
    *     exactly once.
    *   - `a:` the DIRTY side's identity against the CLEAN side's
    *     deletions — a collision exhibits the one-insertion edit
    *     (clean longer).
    *   - `b:` the DIRTY side's deletions against the CLEAN side's
    *     identity (dirty longer).
    * Deletion x deletion never meets (its tags differ), which is
    * precisely the distance-2 delete-one/insert-one false-candidate
    * class plain FastSS pays a confirm pass to discard. array_distinct
    * collapses equal-adjacent-character deletion duplicates within a
    * row. One signature array per row means ONE registry scan, ONE
    * explode, and ONE shuffled equi-join realize all three families
    * (the unioned three-join form paid triple scans and exchanges). */
  private def taggedSigs(c: String, dirtySide: Boolean): Column = {
    val identityTag = if (dirtySide) "a:" else "b:"
    val deletionTag = if (dirtySide) "b:" else "a:"
    expr(
      s"""array_distinct(concat(
         |  array(concat('$identityTag', $c)),
         |  transform(sequence(1, length($c)),
         |    i -> concat('m:', substring($c, 1, i - 1), char(1),
         |                substring($c, i + 1))),
         |  transform(sequence(1, length($c)),
         |    i -> concat('$deletionTag', substring($c, 1, i - 1),
         |                substring($c, i + 1)))))""".stripMargin)
  }

  /** Probe hooks (graft.tools.ProfileEr) — internals exposed read-only
    * so the volume profiler instruments the exact production stages. */
  private[graft] def dirtyNameSqlForProbe: String = dirtyNameSql
  private[graft] def taggedSigsForProbe(c: String, dirtySide: Boolean): Column =
    taggedSigs(c, dirtySide)

  private def registries(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val base = Tables.customer(s, dir).select(col("c_custkey"), col("c_name"))
    (base.select(col("c_custkey").as("src_id"),
        expr(dirtyNameSql).as("dname")),
      base.select(col("c_custkey").as("match_id"),
        col("c_name").as("cname")))
  }

  /** The ALL-PAIRS definitional form. Its output is Θ(Σ per-record
    * edit-ball population), which on a dense registry is not
    * row-linear: the bench replica fixture (keys shifted by i·10⁸,
    * zero-padded names) makes every record's replicas mutual lev-1
    * neighbors, so the TRUE answer grows ~quadratically in replicas
    * (measured: 424k pairs from 15k records at sf0.1, 62M from 150k
    * at sf1). Above `spark.graft.er.maxRows` the constructor refuses
    * — the [[bestMatch]] aggregation form is the scale path whose
    * output stays one row per record — mirroring the
    * [[SimilarityQueries.embeddingNearDup]] all-pairs cap. */
  def fuzzyMatch(s: SparkSession, dir: String): DataFrame = {
    val cap = s.conf.get("spark.graft.er.maxRows", "50000").toLong
    val n = Tables.memoizedAtConstruction(s, dir, "customer", "count") {
      Tables.customer(s, dir).count()
    }
    if (n > cap) throw new graft.model.DesignedSkip(
      s"er_fuzzy_match is the all-pairs definitional form ($n registry " +
        s"rows > cap $cap; on dense key spaces its answer grows " +
        "superlinearly); use the best-match aggregation path " +
        "(er_best_match / EntityResolution.bestMatch) at corpus scale, " +
        "or raise spark.graft.er.maxRows")
    val (dirty, clean) = registries(s, dir)
    fuzzyPairs(dirty, clean)
  }

  /** Packed (dist, match_id) order key: dist ∈ {0, 1} in the high
    * bits, id below — min() over it IS argmin with ties to the lower
    * match_id, in one exact integer. */
  private val PackBase = 1L << 44

  /** The RESOLUTION form — the shape an ER pipeline actually runs at
    * scale: each dirty record keeps its single best match (lowest
    * distance, ties to the lowest match_id).
    *
    * The decisive scale move is NAME-SPACE FACTORIZATION. Real (and
    * this benchmark's replicated) registries hold the same name many
    * times, and pair volume multiplies by holder count on each side —
    * the bench fixture carries every clean name once per replica, so
    * the record-level pair stream grows ~quadratically in replicas
    * (measured 62M pair rows at sf1) while the NAME space stays
    * bounded (the corruption has ≤ 10 variants per base name
    * regardless of replica count). So: (1) collapse the clean side to
    * distinct names, keeping each name's lowest holder id — argmin
    * over (dist, match_id) across all holders equals argmin over
    * per-name minima, because a min over a union is the min of the
    * per-group mins; (2) run the candidate-exact signature join on
    * DISTINCT names only; (3) fold to one packed best per dirty NAME
    * (min is idempotent, so collision multiplicity needs no distinct);
    * (4) expand back to records with one broadcast-able hash join.
    * Join and levenshtein cost become replica-invariant; only the
    * final record-level expansion is registry-sized. */
  def bestMatch(s: SparkSession, dir: String): DataFrame = {
    val (dirty, clean) = registries(s, dir)
    bestMatchOn(dirty, clean)
  }

  /** [[bestMatch]]'s core on arbitrary registries (spec entry). */
  def bestMatchOn(dirty: DataFrame, clean: DataFrame): DataFrame = {
    val cleanNames = clean.groupBy(col("cname"))
      .agg(min(col("match_id")).as("mid"))
    val dirtyNames = dirty.select(col("dname")).distinct()
    val dsig = dirtyNames.select(col("dname"),
      explode(taggedSigs("dname", dirtySide = true)).as("sig"))
    val csig = cleanNames.select(col("cname"), col("mid"),
      explode(taggedSigs("cname", dirtySide = false)).as("sig"))
    val nameBest = dsig.join(csig, "sig")
      .select(col("dname"),
        (graft.functions.HashExpressions
          .boundedLev1(col("dname"), col("cname")) * PackBase +
          col("mid")).as("k"))
      .filter(col("k") < lit(2L * PackBase)) // dist <= 1
      .groupBy(col("dname"))
      .agg(min(col("k")).as("k"))
    dirty.join(nameBest, Seq("dname"))
      .select(col("src_id"),
        (col("k") % PackBase).as("match_id"),
        expr(s"k div ${PackBase}").as("dist"),
        (col("src_id") === col("k") % PackBase).as("same_entity"))
      .orderBy(col("src_id"))
  }

  /** The reusable operator core: all (src_id, match_id) pairs with
    * levenshtein(dname, cname) ≤ 1, on any two registries. */
  def fuzzyPairs(dirty: DataFrame, clean: DataFrame): DataFrame = {
    // one tagged-signature equi-join covers substitution/equality
    // (m: x m:), clean-longer insertion (a: identity x a: deletions),
    // and dirty-longer insertion (b: deletions x b: identity) — see
    // taggedSigs; every collision is a true lev <= 1 pair, so the
    // confirm below is a correctness assertion more than a filter and
    // join output is proportional to the RESULT size
    val dsig = dirty.select(col("src_id"), col("dname"),
      explode(taggedSigs("dname", dirtySide = true)).as("sig"))
    val csig = clean.select(col("match_id"), col("cname"),
      explode(taggedSigs("cname", dirtySide = false)).as("sig"))
    // bounded_lev1 (native kernel, O(n) with an exact-DP fallback)
    // instead of levenshtein(): the full DP costs ~2.7 µs/pair and the
    // confirm runs once per collision — it was the dominant stage of
    // both er operators (~180 s of the old sf1 wall)
    dsig.join(csig, "sig")
      .select(col("src_id"), col("match_id"),
        graft.functions.HashExpressions
          .boundedLev1(col("dname"), col("cname")).as("dist"))
      .filter(col("dist") <= 1)
      .distinct()
      .select(col("src_id"), col("match_id"), col("dist"),
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

  /** Streaming twin of [[bestMatch]]: resolve a STREAM of dirty
    * records against the clean registry. The name-level model
    * (distinct dirty-name → packed best (dist, holder id)) is built in
    * batch — it is bounded by the registry's name space, the same
    * model-table discipline as the pruned text scorers — and the
    * stream side is ONE stateless broadcast hash join per micro-batch:
    * no stream-side shuffle, no state store, append mode. The online
    * shape of record linkage: the match model refreshes out of band,
    * arriving records resolve at wire speed.
    *
    * Model-coverage contract: the name model is keyed by the BATCH
    * dirty registry's distinct names, so a stream record whose name
    * the registry has never seen cannot resolve until the model
    * refreshes — the join is LEFT so such records emit with a NULL
    * match_id/dist (visibly unresolved, routable to a slow path or
    * the next model build) instead of disappearing from the output.
    * Deriving candidates from the clean side's deletion neighborhood
    * instead would make coverage registry-independent, but the
    * neighborhood of a name is O(len·Σ) signatures — the model table
    * would grow by that factor for a case the refresh cycle already
    * handles; the explicit NULL keeps the gap observable instead. */
  def bestMatchStream(stream: DataFrame, s: SparkSession, dir: String)
      : DataFrame = {
    // the model is a BATCH subtree embedded in a streaming plan: left
    // unmaterialized, every micro-batch would re-run the registry scan
    // + signature join + groupBy (measured 7.5 s/batch at sf0.1 — the
    // model build, not the resolve, dominating every trigger). Memoize
    // + persist per (session, registry version): batch one pays the
    // build, later triggers re-broadcast the cached name-sized frame.
    // Release with [[releaseNameModel]] when the registry refreshes.
    val nameBest = Tables.memoizedAtConstruction(s, dir, "customer",
        "er-name-model") {
      val (dirty, clean) = registries(s, dir)
      val cleanNames = clean.groupBy(col("cname"))
        .agg(min(col("match_id")).as("mid"))
      val dirtyNames = dirty.select(col("dname")).distinct()
      val dsig = dirtyNames.select(col("dname"),
        explode(taggedSigs("dname", dirtySide = true)).as("sig"))
      val csig = cleanNames.select(col("cname"), col("mid"),
        explode(taggedSigs("cname", dirtySide = false)).as("sig"))
      dsig.join(csig, "sig")
        .select(col("dname"),
          (graft.functions.HashExpressions
            .boundedLev1(col("dname"), col("cname")) * PackBase +
            col("mid")).as("k"))
        .filter(col("k") < lit(2L * PackBase))
        .groupBy(col("dname"))
        .agg(min(col("k")).as("k"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }
    stream.join(broadcast(nameBest), Seq("dname"), "left")
      .select(col("src_id"),
        (col("k") % PackBase).as("match_id"),
        expr(s"k div ${PackBase}").as("dist"),
        when(col("k").isNull, lit(false))
          .otherwise(col("src_id") === col("k") % PackBase)
          .as("same_entity"))
  }

  /** Release the session's cached streaming name model for `dir`:
    * unpersist + memo eviction, the [[GraphQueries.releaseAdjacency]]
    * discipline (the out-of-band "model refresh" — the next
    * bestMatchStream call rebuilds from the current registry). */
  def releaseNameModel(s: SparkSession, dir: String): Unit = {
    // a RUNNING bestMatchStream query still references the released
    // model plan but not the memo: from its next micro-batch it would
    // silently re-run the full model build every trigger — the exact
    // regression the memo fixed. Stop the owning query first, release,
    // then restart so the rebuilt model is picked up.
    if (s.streams.active.nonEmpty)
      System.err.println(
        s"[er] WARNING: releaseNameModel with ${s.streams.active.length} " +
          "active streaming query(ies) — a running bestMatchStream will " +
          "rebuild the name model EVERY micro-batch from now on; stop it " +
          "before releasing and restart it after")
    Tables.evictMemoMatching(s, dir, "customer", "er-name-model").foreach {
      case df: org.apache.spark.sql.Dataset[_] =>
        df.unpersist(blocking = false)
      case _ => ()
    }
  }

  val bestMatchSql: String =
    s"""WITH dirty AS (
       |  SELECT c_custkey AS src_id, $dirtyNameSql AS dname FROM customer),
       |clean AS (SELECT c_custkey AS match_id, c_name AS cname FROM customer),
       |best AS (
       |  SELECT src_id,
       |    MIN(CAST(levenshtein(dname, cname) AS BIGINT) * ${PackBase}
       |        + match_id) AS k
       |  FROM dirty CROSS JOIN clean
       |  WHERE levenshtein(dname, cname) <= 1
       |  GROUP BY src_id)
       |SELECT src_id, k % ${PackBase} AS match_id,
       |  k // ${PackBase} AS dist,
       |  src_id = k % ${PackBase} AS same_entity
       |FROM best ORDER BY src_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "er_fuzzy_match" -> (fuzzyMatch _),
    "er_best_match" -> (bestMatch _))

  val oracles: Map[String, String] = Map(
    "er_fuzzy_match" -> fuzzyMatchSql,
    "er_best_match" -> bestMatchSql)
}
