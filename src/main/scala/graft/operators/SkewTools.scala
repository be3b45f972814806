package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * A shuffled equi-join sends every row of a key to one reducer; at
  * 100 TB a single hot key (the empty document, a default user id, a
  * null-ish sentinel) turns into one straggler task that dominates
  * the stage. AQE's skew-join handles the SORT-MERGE case
  * adaptively; this utility is the explicit form for when the skew
  * is known ahead of time (or the join is not AQE-splittable): salt
  * the probe side into `salts` sub-keys and replicate the build side
  * once per salt, so the hot key's rows spread over `salts` reducers.
  * Cost model: build side grows ×salts (choose salts ≈ hot-key
  * row-count / average-key row-count, bounded by parallelism); result
  * is row-identical to the plain join.
  */
object SkewTools {

  /** Equi-join `probe ⋈ build` on `key` with `salts`-way salting.
    * The salt's VALUE is irrelevant to the result (every probe row
    * meets exactly one replica of its key's build rows), it only
    * controls placement — but it must be DETERMINISTIC per row
    * content: a monotonically_increasing_id-derived salt changes on
    * task retry whenever the probe's intra-partition row order is
    * nondeterministic (any post-shuffle input), and a recomputed map
    * task that re-salts rows differently duplicates or drops probe
    * rows at the reducers that already fetched the old output. A
    * whole-row hash is retry-stable — and mixing the input partition
    * id into it keeps the spread even when the hot key's rows are
    * exact duplicates (pure content hashing would collapse them all
    * onto ONE salt, silently degrading to an unsalted join in the
    * heavy-duplicate case this helper exists for). The partition id
    * is itself retry-stable: a recomputed map task re-reads the same
    * input partition, so each row re-hashes to the same salt.
    * Duplicates WITHIN one partition still share a salt; that
    * residual is bounded by the partition size, not the key's total
    * row count. */
  /** The probe-side salt expression saltedJoin uses — exposed so the
    * spec's spread assertions exercise the REAL formula (a replicated
    * copy in the test would keep passing if this changed). */
  def probeSalt(probe: DataFrame, salts: Int): org.apache.spark.sql.Column =
    pmod(hash(spark_partition_id() +: probe.columns.map(col): _*),
      lit(salts))

  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salts: Int): DataFrame = {
    // pick an internal column name neither side already carries — a
    // fixed name would silently overwrite (then drop) caller data
    val taken = (probe.columns ++ build.columns).toSet
    val salt = Iterator.from(0)
      .map(i => if (i == 0) "__salt" else s"__salt$i")
      .find(!taken.contains(_)).get
    val p = probe.withColumn(salt, probeSalt(probe, salts))
    val b = build.withColumn(salt,
      explode(array((0 until salts).map(lit): _*)))
    p.join(b, Seq(key, salt)).drop(salt)
  }
}
