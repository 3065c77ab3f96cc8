package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Compliance, Curation, DataContract, Domain, EvalQueries, GraphEvents, MiningQueries, PrefQueries, Relational, Reports, ServingOps, ShopQueries, StatsQueries, TrainOps, TrainingData}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator's (query, oracle) pair from the query modules.
  * Each module covers a section of SURVEY.md §2's inventory.
  */
object SparkEntry {

  /** Flagship: the SURVEY.md §7.2 vertical slice through the full shop ETL
    * (read → skip → transform → calculateFields → category → dedup → agg);
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Flagship.cheapestPerCategory(spark)

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Domain.queries ++ TrainingData.queries ++
      ShopQueries.queries ++ Reports.queries ++ GraphEvents.queries ++
      Curation.queries ++ MiningQueries.queries ++ StatsQueries.queries ++
      EvalQueries.queries ++ PrefQueries.queries ++ TrainOps.queries ++
      Compliance.queries ++ ServingOps.queries ++ DataContract.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ Domain.oracleSql ++ TrainingData.oracleSql ++
      ShopQueries.oracleSql ++ Reports.oracleSql ++ GraphEvents.oracleSql ++
      Curation.oracleSql ++ MiningQueries.oracleSql ++ StatsQueries.oracleSql ++
      EvalQueries.oracleSql ++ PrefQueries.oracleSql ++ TrainOps.oracleSql ++
      Compliance.oracleSql ++ ServingOps.oracleSql ++ DataContract.oracleSql
}
