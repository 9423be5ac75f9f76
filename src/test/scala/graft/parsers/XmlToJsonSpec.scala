package graft.parsers

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Json

/** Behavioral tests for the XML→JSON port, pinned to the reference quirks
  * (SURVEY §5 item 4; `pkg/xml/xml.go:60-179`).
  */
class XmlToJsonSpec extends AnyFunSuite {

  test("declared array paths become JSON arrays; undeclared repeats overwrite (xml.go:115-124,143-150)") {
    val xml = "<root><items><item><id>1</id></item><item><id>2</id></item></items></root>"
    val declared = new XmlToJson(arrays = Seq("root.items.item")).parse(xml)
    assert(declared.at("/root/items/item").isArray)
    assert(declared.at("/root/items/item/1/id").asText == "2")
    val undeclared = new XmlToJson().parse(xml)
    assert(undeclared.at("/root/items/item").isObject) // last one wins
    assert(undeclared.at("/root/items/item/id").asText == "2")
  }

  test("errOnUndeclaredArray rejects duplicate elements (xml.go:151-154)") {
    val xml = "<r><a>1</a><a>2</a></r>"
    val e = intercept[IllegalArgumentException](
      new XmlToJson(errOnUndeclaredArray = true).parse(xml))
    assert(e.getMessage.contains("undeclared array"))
  }

  test("attributes are @-prefixed string fields (xml.go:157-159)") {
    val n = new XmlToJson().parse("""<r><item sku="X9" qty="3"><name>thing</name></item></r>""")
    assert(n.at("/r/item/@sku").asText == "X9")
    assert(n.at("/r/item/@qty").asText == "3")
    assert(n.at("/r/item/name").asText == "thing")
  }

  test("prefix dot-path is descended at EOF (xml.go:74-76,131)") {
    val xml = "<envelope><body><x>v</x></body></envelope>"
    val n = new XmlToJson(prefix = Seq("envelope", "body")).parse(xml)
    assert(n.get("x").asText == "v")
  }

  test("childless elements implode to text; full text by default, 30-char cap in bug-compat mode (xml.go:163-174)") {
    val long = "a" * 45
    val xml = s"<r><t>$long</t></r>"
    assert(new XmlToJson().parse(xml).at("/r/t").asText == long)
    assert(new XmlToJson(maxTextLen = Some(30)).parse(xml).at("/r/t").asText == "a" * 30)
  }

  test("implodeArr collapses wrapper object to the declared array (xml.go:105-111,161-163)") {
    val xml = "<r><list><i><v>1</v></i><i><v>2</v></i></list></r>"
    val n = new XmlToJson(arrays = Seq("r.list.i"), implodeArr = true).parse(xml)
    assert(n.at("/r/list").isArray)
    assert(n.at("/r/list/0/v").asText == "1")
    assert(n.at("/r/list/1/v").asText == "2")
    val keep = new XmlToJson(arrays = Seq("r.list.i")).parse(xml)
    assert(keep.at("/r/list/i").isArray)
  }

  test("reference quirk pinned: declared arrays of LEAF text degrade to last value (xml.go:163-174 implode clobbers)") {
    // The reference's leaf-text implosion overwrites the array entry each
    // time a scalar item closes; arrays only round-trip for object items.
    // Deliberately preserved for behavioral parity.
    val n = new XmlToJson(arrays = Seq("r.list.i")).parse("<r><list><i>1</i><i>2</i></list></r>")
    assert(n.at("/r/list/i").asText == "2")
  }

  test("mixed attributes + nested structs + arrays") {
    val xml =
      """<catalog date="2024-01-01">
        |  <product id="p1"><name>Widget</name><price>9.99</price></product>
        |  <product id="p2"><name>Gadget</name><price>19.99</price></product>
        |</catalog>""".stripMargin
    val n = new XmlToJson(arrays = Seq("catalog.product")).parse(xml)
    assert(n.at("/catalog/@date").asText == "2024-01-01")
    assert(n.at("/catalog/product").size == 2)
    assert(n.at("/catalog/product/1/@id").asText == "p2")
    assert(n.at("/catalog/product/1/price").asText == "19.99")
  }

  test("udf applies distributed over a column") {
    val spark = graft.SparkFixture.spark
    import spark.implicits._
    val df = Seq("<r><v>1</v></r>", "<r><v>2</v></r>").toDF("xml")
    val out = df.select(XmlToJson.xmlToJsonUdf()(org.apache.spark.sql.functions.col("xml")).as("j"))
      .as[String].collect().toList
    assert(out.map(j => Json.parse(j).at("/r/v").asText) == List("1", "2"))
  }
}
