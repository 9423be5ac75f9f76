package graft.sinks

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Json

/** Distributed sink round-trips: envelope NDJSON written by partitioned
  * writes must parse back to the original rows (F1/K1/K6 together: NDJSON
  * is `spark.read.json`'s native format), including zstd-compressed.
  */
class EnvelopesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private lazy val df = Seq((1L, "a", 9.5), (2L, "b", 3.25), (3L, "c\"quoted", -1.0))
    .toDF("id", "name", "amount")

  test("airbyte envelope NDJSON round-trips through partitioned write + spark.read.json") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ndjson").toString
    Envelopes.writeNdjson(df.repartition(2), Envelopes.airbyteRecord("s", df, lit(123L)), dir)
    val back = spark.read.json(dir)
    assert(back.count() == 3)
    val rows = back.select(col("record.data.id"), col("record.data.name"), col("record.data.amount"))
      .collect().map(_.toSeq).toSet
    assert(rows == df.collect().map(_.toSeq).toSet)
    assert(back.select(col("record.emitted_at")).distinct().as[Long].head() == 123L)
  }

  test("compressed NDJSON is readable back (K6; gzip here — text-sink zstd needs a Hadoop codec this container lacks; HTTP-level zstd is covered in HttpFrontendSpec)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gz").toString
    Envelopes.writeNdjson(df, Envelopes.singerRecord("s", df, lit(7L)), dir, Some("gzip"))
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".gz"))
    assert(files.nonEmpty) // actually compressed
    val back = spark.read.json(dir) // spark decompresses by extension
    assert(back.count() == 3)
    assert(back.select("stream").distinct().as[String].head() == "s")
  }

  test("null fields are emitted, not dropped (parity with Go json.Marshal / driver ProtoWriter)") {
    val nullDf = Seq((1L, Option("a")), (2L, Option.empty[String])).toDF("id", "name")
    val line = nullDf.filter(col("id") === 2)
      .select(Envelopes.airbyteRecord("s", nullDf, lit(1L)).as("v")).as[String].head()
    assert(line.contains(""""name":null"""), s"null field missing from envelope: $line")
    val singer = nullDf.filter(col("id") === 2)
      .select(Envelopes.singerRecord("s", nullDf, lit(1L)).as("v")).as[String].head()
    assert(singer.contains(""""name":null"""), s"null field missing from singer envelope: $singer")
  }

  test("every line is valid single-line JSON (interleave-safety by partitioned files)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-lines").toString
    Envelopes.writeNdjson(df.repartition(3), Envelopes.airbyteRecord("s", df, lit(0L)), dir)
    val lines = spark.read.text(dir).as[String].collect()
    assert(lines.length == 3)
    lines.foreach(l => assert(Json.parse(l).get("type").asText == "RECORD"))
  }
}
