package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AnnIvf, AnnLsh, AsofJoin, BehaviorQueries,
  BpeTrainer, CurationQueries, DataloaderQueries, DecisionSupportQueries,
  DedupQueries, DynamicRules, EventQueries, MediaPipeline,
  RelationalQueries, SemDedup, SimilarityQueries, SketchQueries,
  SubqueryQueries, TextQueries}

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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      EventQueries.queries ++
      TextQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      DynamicRules.queries ++
      MediaPipeline.queries ++
      AnnLsh.queries ++
      AnnIvf.queries ++
      AsofJoin.queries ++
      SubqueryQueries.queries ++
      DecisionSupportQueries.queries ++
      BehaviorQueries.queries ++
      SketchQueries.queries ++
      CurationQueries.queries ++
      SemDedup.queries ++
      BpeTrainer.queries ++
      DataloaderQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++
      EventQueries.oracles ++
      TextQueries.oracles ++
      DedupQueries.oracles ++
      SimilarityQueries.oracles ++
      DynamicRules.oracles ++
      MediaPipeline.oracles ++
      AnnLsh.oracles ++
      AnnIvf.oracles ++
      AsofJoin.oracles ++
      SubqueryQueries.oracles ++
      DecisionSupportQueries.oracles ++
      BehaviorQueries.oracles ++
      SketchQueries.oracles ++
      CurationQueries.oracles ++
      SemDedup.oracles ++
      BpeTrainer.oracles ++
      DataloaderQueries.oracles
}
