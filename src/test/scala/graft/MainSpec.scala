package graft

import java.io.StringWriter

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Json

/** CLI frontend end-to-end (no egress: spec/discover never issue HTTP):
  * argv → synthesized control NDJSON → Connector.handle → protocol NDJSON,
  * the reference's `pkg/airbyte/cmd.go` flow.
  */
class MainSpec extends AnyFunSuite {

  test("spec: emits ConnectorSpecification with config schema and secret marker") {
    val out = new StringWriter()
    Main.run(Array("spec", "--connector", "shopify"), out)
    val n = Json.parse(out.toString.trim)
    assert(n.get("type").asText == "SPEC")
    assert(n.at("/spec/supportsIncremental").asBoolean)
    assert(n.at("/spec/connectionSpecification/properties/token/airbyte_secret").asBoolean)
  }

  test("discover: emits catalog of declared streams with sync modes") {
    val out = new StringWriter()
    Main.run(Array("discover", "--connector", "shopify"), out)
    val n = Json.parse(out.toString.trim)
    assert(n.get("type").asText == "CATALOG")
    val st = n.at("/catalog/streams/0")
    assert(st.get("name").asText == "orders")
    assert(st.get("supported_sync_modes").toString.contains("incremental"))
  }

  test("singer format flag routes to the singer dialect") {
    val out = new StringWriter()
    Main.run(Array("spec", "--connector", "pokeapi", "--format", "singer"), out)
    // singer spec envelope is the same shape; key point: no exception and a
    // SPEC line, via the singer writer
    assert(Json.parse(out.toString.trim).get("type").asText == "SPEC")
  }

  test("inline JSON config flag parses as file-or-inline") {
    val out = new StringWriter()
    Main.run(Array("spec", "--connector", "sitoo", "--config", """{"api_url":"http://x"}"""), out)
    assert(Json.parse(out.toString.trim).get("type").asText == "SPEC")
  }

  test("read: full CLI sync against an in-process server (E1 end-to-end)") {
    // 13 products: two full pages of 10 + a short page ends the offset loop
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", ex => {
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split('&').filter(_.contains('=')).map { kv =>
        val Array(k, v) = kv.split('=').padTo(2, ""); k -> v
      }.toMap
      val start = params.getOrElse("start", "0").toInt
      val items = (start until math.min(start + 10, 13)).map { i =>
        s"""{"productid":$i,"title":"P$i","moneyprice":"${i * 2.0}"}"""
      }.mkString("[", ",", "]")
      val body = s"""{"items":$items}""".getBytes("UTF-8")
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body)
      ex.close()
    })
    server.start()
    try {
      val out = new StringWriter()
      Main.run(Array("read", "--connector", "sitoo",
        "--config", s"""{"api_url":"http://127.0.0.1:${server.getAddress.getPort}"}"""), out)
      val lines = out.toString.trim.split('\n').map(Json.parse)
      val records = lines.filter(_.get("type").asText == "RECORD")
      assert(records.length == 13)
      assert(records.map(_.at("/record/data/productid").asLong).toSet == (0L until 13L).toSet)
      // airbyte dialect: one trailing STATE doc closes the sync
      assert(lines.last.get("type").asText == "STATE")
    } finally server.stop(0)
  }
}
