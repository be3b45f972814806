package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnIvf, AnnIvfPq, AnnLsh, AnnPq, AsofJoin, BehaviorQueries,
  BpeTrainer, CurationQueries, DataloaderQueries, DecisionSupportQueries,
  DedupQueries, DynamicRules, EntityResolution, EventQueries,
  GraphQueries, MediaPipeline, RelationalQueries, SemDedup,
  SimilarityQueries, SketchQueries, SubqueryQueries, TextQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY §2 plus the training-data-pipeline operators);
  * `oracleSql` holds the DuckDB-equivalent SQL the driver checks each
  * entry against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  private def queryModules: Seq[Map[String, (SparkSession, String) => DataFrame]] =
    Seq(RelationalQueries.queries, EventQueries.queries,
      TextQueries.queries, DedupQueries.queries,
      SimilarityQueries.queries, DynamicRules.queries,
      MediaPipeline.queries, AnnLsh.queries, AnnIvf.queries,
      AsofJoin.queries, SubqueryQueries.queries,
      DecisionSupportQueries.queries, BehaviorQueries.queries,
      SketchQueries.queries, CurationQueries.queries,
      SemDedup.queries, BpeTrainer.queries, DataloaderQueries.queries,
      EntityResolution.queries, GraphQueries.queries, AnnPq.queries,
      AnnIvfPq.queries, graft.sources.BucketedLayout.queries)

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val merged = queryModules.reduce(_ ++ _)
    // Map ++ silently SHADOWS duplicate keys: a new module reusing an
    // existing query name would make the earlier query's parquet dump
    // — and with it its oracle compare — vanish without any signal.
    // Fail at the aggregation point instead.
    val total = queryModules.map(_.size).sum
    require(merged.size == total, {
      val dups = queryModules.flatMap(_.keys)
        .groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
      s"duplicate query names across modules: ${dups.mkString(", ")}"
    })
    merged
  }

  def oracleSql: Map[String, String] = {
    val mods = Seq(RelationalQueries.oracles, EventQueries.oracles,
      TextQueries.oracles, DedupQueries.oracles,
      SimilarityQueries.oracles, DynamicRules.oracles,
      MediaPipeline.oracles, AnnLsh.oracles, AnnIvf.oracles,
      AsofJoin.oracles, SubqueryQueries.oracles,
      DecisionSupportQueries.oracles, BehaviorQueries.oracles,
      SketchQueries.oracles, CurationQueries.oracles,
      SemDedup.oracles, BpeTrainer.oracles, DataloaderQueries.oracles,
      EntityResolution.oracles, GraphQueries.oracles, AnnPq.oracles,
      AnnIvfPq.oracles, graft.sources.BucketedLayout.oracles)
    val merged = mods.reduce(_ ++ _)
    require(merged.size == mods.map(_.size).sum,
      "duplicate oracle names across modules (Map ++ silently shadows)")
    // an oracle without a query would make the driver's compare report
    // a missing parquet for a query that does not exist — catch the
    // wiring mistake here, where the module author sees it
    val orphans = merged.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracles without a query: ${orphans.mkString(", ")}")
    merged
  }
}
