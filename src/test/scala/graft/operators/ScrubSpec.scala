package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** PII redaction: pattern coverage, rule ordering, per-row counts. */
class ScrubSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private val rows = Seq(
    (1L, "contact alice.smith+x@example.co.uk or call +1 (555) 123-4567 now"),
    (2L, "order 12345 shipped to bob@mail.org"),
    (3L, "no pii here at all"),
    (4L, "just one digit 7 stays"))
    .toDF("id", "txt")

  test("email, phone and digit runs are redacted; counts per row") {
    val out = Scrub.redact(rows, "txt")
      .select("id", "txt_redacted", "n_redactions")
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == "contact [EMAIL] or call [PHONE] now")
    // email rule runs before digit-run: the order id is a [NUM], the email
    // domain is not double-redacted
    assert(out(2L)._1 == "order [NUM] shipped to [EMAIL]")
    assert(out(2L)._2 == 2)
    assert(out(3L) == ("no pii here at all", 0))
    assert(out(4L) == ("just one digit 7 stays", 0)) // single digits untouched
  }

  test("phone-like digit runs inside a redacted phone are not re-counted in output") {
    // counts are computed on the ORIGINAL text per rule: the phone body also
    // matches digit-run, so n_redactions counts both (documented behavior —
    // a monitoring signal, not a census)
    val out = Scrub.redact(Seq((1L, "call +1 (555) 123-4567")).toDF("id", "txt"), "txt")
      .select("txt_redacted", "n_redactions").as[(String, Int)].head()
    assert(out._1 == "call [PHONE]")
    assert(out._2 >= 1)
  }
}
