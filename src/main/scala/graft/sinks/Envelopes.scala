package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Protocol-envelope encoders as Catalyst Columns — the distributed dual of
  * the driver-side [[graft.core.ProtoWriter]]: `to_json(struct(...))` runs
  * in whole-stage codegen across every partition, so a 100 TB stream encodes
  * in parallel with no driver involvement. The reference's 4 KiB buffer +
  * mutex interleave (`proto.go:347-363`, `protocol.go:28-33`) is irrelevant
  * here: each partition writes its own file.
  *
  * Envelope shapes:
  *  - Airbyte RECORD: `pkg/airbyte/proto.go:21-32`
  *  - Singer RECORD: `pkg/singer/singer_stream.go:21-26`
  */
object Envelopes {

  /** to_json drops null fields by default
    * (spark.sql.jsonGenerator.ignoreNullFields=true); the reference's Go
    * json.Marshal — and the driver-side ProtoWriter — emit them, so the
    * distributed envelopes must too or rows containing nulls break golden
    * parity.
    */
  private val keepNulls = Map("ignoreNullFields" -> "false")

  /** `{"type":"RECORD","record":{"stream":…,"emitted_at":ms,"data":{row}}}` */
  def airbyteRecord(stream: String, df: DataFrame,
      emittedAt: Column = unix_millis(current_timestamp())): Column =
    to_json(struct(
      lit("RECORD").as("type"),
      struct(
        lit(stream).as("stream"),
        emittedAt.as("emitted_at"),
        struct(df.columns.map(col).toIndexedSeq: _*).as("data")).as("record")), keepNulls)

  /** `{"type":"RECORD","stream":…,"time_extracted":s,"record":{row}}` */
  def singerRecord(stream: String, df: DataFrame,
      timeExtracted: Column = unix_timestamp(current_timestamp())): Column =
    to_json(struct(
      lit("RECORD").as("type"),
      lit(stream).as("stream"),
      timeExtracted.as("time_extracted"),
      struct(df.columns.map(col).toIndexedSeq: _*).as("record")), keepNulls)

  /** Write a stream as envelope NDJSON text files; optional zstd (K6 —
    * `option("compression","zstd")`, the engine dual of the reference's
    * Accept-Zstd negotiation `proto.go:196-204`).
    */
  def writeNdjson(df: DataFrame, envelope: Column, path: String,
      compression: Option[String] = None): Unit = {
    val w = df.select(envelope.as("value")).write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).text(path)
  }
}
