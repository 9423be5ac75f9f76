package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpServer
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup.DocEvent

/** The full streaming pipeline composed END-TO-END as ONE query — the
  * r9-verdict gap: every piece existed (checkpointed HTTP micro-batch
  * cursor source, bounded-memory Bloom dedup state, Airbyte envelope sink)
  * but no spec drove source → stateful dedup → protocol sink through a
  * stop/restart as a single checkpointed query.
  *
  * The restart must recover THREE kinds of state from one checkpoint:
  *  1. the SOURCE cursor — the resumed query's first window starts at the
  *     committed offset (asserted from the updated_at_min the upstream
  *     server actually receives), not at the epoch;
  *  2. the DEDUP state store — a duplicate text arriving after the restart
  *     under a NEW id can only be suppressed by the restored Bloom bitmap;
  *  3. the SINK epochs — every surviving record's envelope appears EXACTLY
  *     once across the epoch directories (no replays, no losses).
  */
class ComposedPipelineSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark

  test("source → Bloom dedup → Airbyte sink survives a stop/restart exactly-once") {
    import spark.implicits._
    val records = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val mins = new java.util.concurrent.CopyOnWriteArrayList[String]()
    records.add("""{"id":1,"updated_at":"2024-03-01T01:00:00Z","text":"alpha beta gamma"}""")
    records.add("""{"id":2,"updated_at":"2024-03-01T01:30:00Z","text":"alpha beta gamma"}""")
    records.add("""{"id":3,"updated_at":"2024-03-01T02:00:00Z","text":"something else entirely"}""")
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/", ex => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      q.split('&').filter(_.startsWith("updated_at_min=")).foreach(p =>
        mins.add(java.net.URLDecoder.decode(p.drop("updated_at_min=".length), "UTF-8")))
      val body = s"""{"items":[${String.join(",", records)}],"next":null}"""
        .getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    s.start()
    try {
      val url = s"http://127.0.0.1:${s.getAddress.getPort}"
      import graft.core.{FieldDef, SourceDef, StreamDef}
      import graft.sources.{HttpRequest, PaginatedStream, Pagination}
      import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
      val schema = StructType(Seq(StructField("id", LongType),
        StructField("updated_at", StringType), StructField("text", StringType)))
      graft.connectors.ConnectorDefs.register(SourceDef(
        name = "composed-test",
        httpStreams = Seq(StreamDef("docs", schema, incremental = true,
          iterateBy = Some(FieldDef(Seq("updated_at")))) -> new graft.core.HttpRunner {
          override def stream(config: Option[com.fasterxml.jackson.databind.JsonNode],
              state: Option[com.fasterxml.jackson.databind.JsonNode]): PaginatedStream = {
            val from = state.flatMap(st => Option(st.get("To"))).map(_.asText)
              .getOrElse("1970-01-01T00:00:00Z")
            PaginatedStream(
              HttpRequest(config.map(_.get("url").asText).getOrElse(url),
                params = Seq("updated_at_min" -> from)),
              Pagination.NextUrl("next"), Seq("items"))
          }
        })))
      val out = java.nio.file.Files.createTempDirectory("graft-composed-out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("graft-composed-ckpt").toString
      def run(now: String): Unit = {
        val src = spark.readStream.format("graft-http")
          .option("connector", "composed-test").option("stream", "docs")
          .option("config", s"""{"url":"$url"}""")
          .option("nowOverride", now)
          .load()
        val deduped = StreamingDedup.bloomDedup(
          src.select(col("id").as("doc_id"), col("text")).as[DocEvent])
        val q = EventStreams.startToAirbyteNdjson(deduped.toDF(), "docs", out, ckpt)
        try q.processAllAvailable() finally q.stop() // stop() = the crash point
      }
      def envelopeIds(): Seq[Long] = {
        val files = spark.read.text(s"$out/epoch=*").collect().map(_.getString(0))
        files.toSeq.map(l => graft.core.Json.parse(l).at("/record/data/doc_id").asLong)
      }

      // phase 1: window [epoch, 03:00) — doc 2 is a within-phase duplicate
      run("2024-03-01T03:00:00Z")
      assert(envelopeIds().sorted == Seq(1L, 3L),
        s"phase 1 must emit first-occurrence docs only, got ${envelopeIds().sorted}")

      // upstream grows: doc 4 re-sends doc 1's text under a NEW id (only
      // the RESTORED bloom state can suppress it), doc 5 is genuinely new
      records.add("""{"id":4,"updated_at":"2024-03-01T04:00:00Z","text":"alpha beta gamma"}""")
      records.add("""{"id":5,"updated_at":"2024-03-01T04:30:00Z","text":"fresh and unseen words"}""")
      mins.clear()

      // phase 2: restart from the SAME checkpoint with a later clock
      run("2024-03-01T06:00:00Z")

      // 1. cursor resumed: the resumed sync asked upstream for the window
      //    from the COMMITTED offset (03:00), never from the epoch
      assert(!mins.isEmpty, "resumed query must have fetched upstream")
      assert(mins.asInstanceOf[java.util.List[String]].stream().allMatch(_ == "2024-03-01T03:00:00Z"),
        s"resume must continue at the committed cursor, got $mins")
      // 2+3. dedup state + exactly-once: 4 suppressed by restored state;
      //      1 and 3 not replayed; 5 delivered once
      val finalIds = envelopeIds()
      assert(finalIds.sorted == Seq(1L, 3L, 5L),
        s"exactly-once envelopes {1,3,5} expected, got ${finalIds.sorted}")
      assert(finalIds.distinct.size == finalIds.size, "no envelope may appear twice")
    } finally s.stop(0)
  }
}
