package graft.core

import java.io.StringWriter
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.connectors.ConnectorDefs
import graft.sources.{HttpClient, HttpRequest, HttpResponse}

import scala.collection.mutable

/** Cross-cutting integration tests:
  *  - full incremental sync cycle: read → state persist → windowed re-read
  *    (SURVEY §7 hard part a: state only advances after a successful write);
  *  - manual push runners fanning one fetch into several streams (S10);
  *  - SQL registration of the custom codegen expressions.
  */
class IntegrationSpec extends AnyFunSuite {

  test("incremental cycle: first sync full window, second sync starts at persisted cursor (S8+K2)") {
    val t1 = Instant.parse("2024-03-01T00:00:00Z")
    val t2 = Instant.parse("2024-03-02T00:00:00Z")
    val seen = mutable.ArrayBuffer[HttpRequest]()
    val client: HttpClient = req => { seen += req; HttpResponse(200, """{"orders":[{"id":1}]}""", Map.empty) }
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cycle").toString
    val store = new FileStateStore(stateDir)

    def sync(now: Instant): Unit = {
      val src = ConnectorDefs.shopify(() => now)
      val rc = RunConfig.Empty.copy(states = store.loadAll())
      val out = new StringWriter
      Connector.handle(src, Cmd.Read, rc, out, client)
      // persist emitted state (driver-side dual of the Airbyte STATE doc)
      val state = out.toString.linesIterator.toList.last
      val data = Json.parse(state).at("/state/data")
      data.fields().forEachRemaining(e => store.save(e.getKey, Json.write(e.getValue)))
    }

    sync(t1)
    assert(seen.last.params.toMap.apply("updated_at_max") == "2024-03-01T00:00:00Z")
    assert(store.load("orders").get.get("To").asText == "2024-03-01T00:00:00Z")

    sync(t2)
    val p2 = seen.last.params.toMap
    assert(p2("updated_at_min") == "2024-03-01T00:00:00Z") // window starts at cursor
    assert(p2("updated_at_max") == "2024-03-02T00:00:00Z")
    assert(store.load("orders").get.get("To").asText == "2024-03-02T00:00:00Z")
  }

  test("manual runner pushes records into multiple streams from one pass (S10, backend.go:9-48)") {
    val a = StreamDef("alpha", org.apache.spark.sql.types.StructType(Nil))
    val b = StreamDef("beta", org.apache.spark.sql.types.StructType(Nil))
    val src = SourceDef(name = "manual",
      manualStreams = Seq(a, b),
      manualRunners = Seq(new ManualRunner {
        override def run(ctx: ManualContext): Unit = {
          ctx.stream("alpha").emit("""{"x":1}""")
          ctx.stream("beta").emit("""{"y":2}""")
          ctx.stream("alpha").emit("""{"x":3}""")
          ctx.stream("alpha").emitState("""{"cursor":3}""")
        }
      }))
    val out = new StringWriter
    Connector.handle(src, Cmd.Read, RunConfig.Empty, out,
      (_: HttpRequest) => HttpResponse(200, "{}", Map.empty), clock = () => 5L)
    val lines = out.toString.linesIterator.toList
    assert(lines.count(_.contains(""""stream":"alpha"""")) == 2)
    assert(lines.count(_.contains(""""stream":"beta"""")) == 1)
    assert(lines.last == """{"type":"STATE","state":{"data":{"alpha":{"cursor":3}}}}""")
  }

  test("custom expressions callable from SQL after registration") {
    val spark = graft.SparkFixture.spark
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b").createOrReplaceTempView("vt")
    assert(spark.sql("SELECT dot_product(a, b) d FROM vt").as[Double].head() == 11.0)
    assert(spark.sql("SELECT simhash64(array(5L)) s").as[Long].head() == 5L)
    assert(spark.sql("SELECT byte_stride(cast('abcdef' as binary), 2) b").as[Array[Byte]].head()
      .sameElements("ace".getBytes))
    assert(spark.sql("SELECT size(minhash_sig(array(1L,2L), 8, 42)) n").as[Int].head() == 8)
    val sig = spark.sql("SELECT rhp_signature(a, 2, 8, 7) s FROM vt").as[Long].head()
    assert(sig >= 0 && sig < 256)
    assert(spark.sql("SELECT size(shingle_hashes('a b c d', 2)) n").as[Int].head() == 3)
    assert(spark.sql(
      "SELECT argmin_l2(array(0.1f, 0.9f), array(array(1.0f, 0.0f), array(0.0f, 1.0f))) i")
      .as[Int].head() == 1)
    // empty hash array: explicit 0, not the vacuous all-ones of 2*0 >= 0
    assert(spark.sql("SELECT simhash64(cast(array() as array<bigint>)) s").as[Long].head() == 0L)
    // Bloom pair: build a bitmap over two hashes, probe a member and a
    // non-member through SQL end-to-end (aggregate + scalar registration)
    Seq(42L, 99L).toDF("h").createOrReplaceTempView("bt")
    spark.sql("SELECT bloom_bitmap(h, 65536, 4) bm FROM bt").createOrReplaceTempView("bm")
    assert(spark.sql("SELECT bloom_contains(42L, bm, 65536, 4) c FROM bm").as[Boolean].head())
    assert(!spark.sql("SELECT bloom_contains(7L, bm, 65536, 4) c FROM bm").as[Boolean].head())
  }
}
