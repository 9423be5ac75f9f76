package graft.connectors

import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.sources._

import scala.collection.mutable

/** Connector-declaration tests: request shapes (projection/predicate
  * pushdown into params, SURVEY §2 P1-P3), incremental window + state
  * round-trip (S8), and the Spark read surface with declared schemas.
  */
class ConnectorDefsSpec extends AnyFunSuite {

  final class Capture(body: String, headers: (String, String)*) extends HttpClient {
    val requests = mutable.ArrayBuffer[HttpRequest]()
    override def get(req: HttpRequest): HttpResponse = {
      requests += req
      HttpResponse(200, body, headers.toMap)
    }
  }

  test("shopify: fields projection + cursor window params (shopify.go:48-53) and state advance (shopify.go:67-72)") {
    val now = Instant.parse("2024-06-15T12:00:00Z")
    val runner = new ConnectorDefs.ShopifyOrdersRunner(() => now)
    val st = Json.parse("""{"To":"2024-01-01T00:00:00Z"}""")
    val ps = runner.stream(None, Some(st))
    val params = ps.base.params.toMap
    assert(params("fields") == "created_at,currency,id,total_price,updated_at") // sorted, schema-derived
    assert(params("status") == "any")
    assert(params("updated_at_min") == "2024-01-01T00:00:00Z")
    assert(params("updated_at_max") == "2024-06-15T12:00:00Z")
    // new cursor = window end, persisted only after sync
    assert(runner.newState(None, Some(st)).get == """{"To":"2024-06-15T12:00:00Z"}""")
  }

  test("shopify: no prior state → 10y lookback window (shopify.go:67-72)") {
    val now = Instant.parse("2024-06-15T12:00:00Z")
    val runner = new ConnectorDefs.ShopifyOrdersRunner(() => now)
    val params = runner.stream(None, None).base.params.toMap
    assert(params("updated_at_min") == "2014-06-18T12:00:00Z") // now - 10*365d (3 leap days in range)
  }

  test("shopify: newState persists the exact fetched `to`, not a clock re-read (shopify.go:60-62)") {
    // Moving clock: the sync takes 90s between issuing the window and
    // persisting state. The persisted To must be the updated_at_max actually
    // requested — a re-read of the clock would leave a permanently skipped
    // gap of records updated during the sync.
    var t = Instant.parse("2024-06-15T12:00:00Z")
    val runner = new ConnectorDefs.ShopifyOrdersRunner(() => t)
    val st = Json.parse("""{"To":"2024-01-01T00:00:00Z"}""")
    val issued = runner.stream(None, Some(st)).base.params.toMap.apply("updated_at_max")
    t = t.plusSeconds(90) // clock advances while records stream
    assert(runner.newState(None, Some(st)).get == s"""{"To":"$issued"}""")
  }

  test("storm: $select scalars + $expand nested struct projection (storm.go:47-55)") {
    val runner = new ConnectorDefs.StormRunner
    val params = runner.selectParams(ConnectorDefs.stormItemSchema).toMap
    assert(params("$select") == "Id,Quantity")
    assert(params("$expand") == "Product($select=Id,Name)")
  }

  test("readDataFrames: declared schema, never inferred (schema.go:27-35 contract)") {
    val spark = graft.SparkFixture.spark
    val client = new Capture(
      """{"items":[{"productid":1,"title":"A","moneyprice":"9.90","noise":true},{"productid":2,"title":"B","moneyprice":"1.50"}]}""")
    val dfs = Connector.readDataFrames(spark, ConnectorDefs.sitoo, RunConfig.Empty, client)
    val df = dfs("products")
    assert(df.schema == ConnectorDefs.sitooProductSchema) // undeclared "noise" pruned
    val rows = df.orderBy("productid").collect()
    assert(rows.map(_.getLong(0)).toList == List(1L, 2L))
    assert(rows(0).getString(1) == "A")
  }

  test("registry exposes the five reference connectors") {
    // subset, not equality: other suites may register() extra connectors
    assert(Set("pokeapi", "shopify", "klaviyo", "sitoo", "storm").subsetOf(ConnectorDefs.all.keySet))
    assert(ConnectorDefs.all("shopify").supportsIncremental)
    assert(!ConnectorDefs.all("pokeapi").supportsIncremental)
  }

  test("spec json embeds config schema with secret marker (sourcedef.go:120-126)") {
    val sp = Json.parse(ConnectorDefs.all("klaviyo").spec)
    assert(sp.at("/connectionSpecification/properties/api_key/airbyte_secret").asBoolean)
  }
}
