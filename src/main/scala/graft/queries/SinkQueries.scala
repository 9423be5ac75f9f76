package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.Envelopes

/** Protocol-sink envelope encoding as oracle-checked queries: the
  * distributed `to_json(struct(...))` encoders (graft.sinks.Envelopes) must
  * produce byte-identical NDJSON to an independent JSON constructor
  * (DuckDB's to_json over struct_pack). `emitted_at`/`time_extracted` are
  * pinned to a constant — the driver compares values, and wall-clock isn't
  * part of envelope correctness.
  */
object SinkQueries extends QueryPack {

  private def qAirbyte(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation")
    nation.select(
      col("n_nationkey"),
      Envelopes.airbyteRecord("nation", nation, lit(1700000000000L)).as("line"))
      .orderBy("n_nationkey")
  }

  private val qAirbyteSql =
    """SELECT n_nationkey,
       to_json(struct_pack(type := 'RECORD', record := struct_pack(
         stream := 'nation', emitted_at := 1700000000000,
         data := struct_pack(n_nationkey := n_nationkey, n_name := n_name, n_regionkey := n_regionkey)
       ))) AS line
       FROM nation ORDER BY n_nationkey"""

  private def qSinger(s: SparkSession, dir: String): DataFrame = {
    val nation = t(s, dir, "nation")
    nation.select(
      col("n_nationkey"),
      Envelopes.singerRecord("nation", nation, lit(1700000000L)).as("line"))
      .orderBy("n_nationkey")
  }

  private val qSingerSql =
    """SELECT n_nationkey,
       to_json(struct_pack(type := 'RECORD', stream := 'nation',
         time_extracted := 1700000000,
         record := struct_pack(n_nationkey := n_nationkey, n_name := n_name, n_regionkey := n_regionkey)
       )) AS line
       FROM nation ORDER BY n_nationkey"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sink_airbyte_envelope" -> (qAirbyte _),
    "sink_singer_envelope" -> (qSinger _))

  override val oracles: Map[String, String] = Map(
    "sink_airbyte_envelope" -> qAirbyteSql,
    "sink_singer_envelope" -> qSingerSql)
}
