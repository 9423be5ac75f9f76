package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are organized into packs (one per SURVEY.md §2 / north-star
  * category); each pack carries its own DuckDB oracle SQL.
  */
object SparkEntry {

  private[graft] val packs: Seq[QueryPack] = Seq(
    RelationalQueries,
    WindowQueries,
    EventQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries,
    RetrievalQueries,
    SinkQueries,
    AdvancedQueries,
    PipelineQueries,
    TpchShapes)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q5_local_supplier")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
