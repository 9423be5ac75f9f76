package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The FAISS-style refine step must actually refine: exact re-ranking of the
  * widened ADC candidate set cannot do worse than the code-space top-5 on
  * the fixture corpus (values themselves are hash-pinned by the oracle; this
  * pins the RELATIONSHIP so a broken refine step fails fast and readably).
  */
class AnnRerankSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("ivfpq re-rank lifts recall over plain ADC; both return full top-5 sets") {
    val recall = SimilarityQueries.queries("ann_recall_at_5")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("path") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_returned")))
      .toMap
    val (adcHits, adcN) = recall("ann_ivfpq_adc")
    val (rrHits, rrN) = recall("ann_ivfpq_rerank")
    assert(adcN == 50 && rrN == 50, "both paths must return 5 per query")
    assert(rrHits >= adcHits,
      s"re-rank ($rrHits hits) must not lose recall vs plain ADC ($adcHits)")
    // and on this corpus the 4-bit codes are lossy enough that the refine
    // step visibly bites — a strict improvement, not a tie
    assert(rrHits > adcHits, "refine step produced no lift on the fixture corpus")
  }
}
