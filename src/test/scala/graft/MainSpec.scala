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
}
