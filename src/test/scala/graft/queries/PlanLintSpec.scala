package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape lint over EVERY gate query: no query may plan a cartesian
  * product, and nested-loop joins are allowed only where a tiny broadcast
  * side is the deliberate design (documented whitelist). This is the
  * automated version of the per-operator `.explain` audit — a future edit
  * that degrades an equi-join into a nested loop fails here, not in the
  * next round's bench.
  */
class PlanLintSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  // crossJoin against a broadcast handful (query set / seed centroids /
  // one-row scalar aggregate) is the intended plan for these — the corpus
  // side streams, nothing shuffles
  private val bnljAllowed = Set(
    "knn_cosine_brute",  // corpus × broadcast query set
    "ann_ivf_coarse",    // corpus × 8 broadcast seed centroids
    "text_tfidf_topk",   // × broadcast 1-row corpus-size aggregate
    "text_unigram_kl",   // × broadcast 1-row total-count aggregate
    "text_surprisal",    // × broadcast 1-row total-count aggregate
    "dedup_semantic",    // corpus × 8 broadcast seed centroids (cell assignment)
    "q22_inactive",      // × broadcast 1-row scalar-subquery aggregate
    "q11_important_stock", // × broadcast 1-row global-value aggregate (HAVING)
    "q15_top_supplier",    // × broadcast 1-row max-over-self aggregate
    "q_heavy_hitters_bound", // × broadcast 1-row count-min sketch
    "text_ccnet_buckets",    // × broadcast 1-row total-count aggregate (as text_surprisal)
    "ann_recall_at_5",       // × broadcast 1-row true-neighbor-count aggregate
                             //   (plus the whitelisted sub-plans of the three
                             //   ANN paths + brute force it composes)
    "emb_kmeans",            // corpus × broadcast k-centroid row (assignCells)
    "ann_ivf_trained",       // same assignCells broadcast, trained centroids
    "ann_ivfpq_adc",         // assignCells + probeCells 1-row centroid-array
                             //   broadcasts (trained cells route, PQ scores)
    "pipeline_hard_negatives", // corpus × broadcast query set (knn shape)
    "pipeline_dsir",           // × broadcast 1-row token-total aggregate
                               //   (smoothing denominators, as text_surprisal)
    "pipeline_temperature_mix", // × broadcast 1-row corpus-total aggregate
    "text_bm25_topk",          // × broadcast 1-row (N, avgdl) corpus stats
    "retrieval_rrf_fusion",    // same bm25 stats broadcast + × broadcast
                               //   1-row query embedding (dense ranker)
    "dedup_bloom_probe",       // × broadcast 1-row Bloom bitmap
    "ann_ivfpq_rerank",        // the widened IVFADC sub-plan's whitelisted
                               //   broadcasts (assignCells + probeCells)
    "ann_ivfpq_append",        // same assignCells/probeCells 1-row
                               //   centroid-array broadcasts, on both the
                               //   corpus-encode and fresh-append sides
    "q_profile_columns",       // × broadcast 1-row exact-distinct
                               //   validator aggregates (the HLL bound
                               //   flags of the hybrid profiler)
    "q_profile_documents",     // same device over documents: 1-row mode
                               //   and exact-distinct validator broadcasts
    "ann_index_occupancy",     // assignCells 1-row centroid-array broadcast
                               //   (the encode under the trained quantizer)
    "ann_filtered_search",     // same assignCells/probeCells 1-row
                               //   centroid-array broadcasts as
                               //   ann_ivfpq_adc; the metadata predicate is
                               //   a scan filter, not a join
    "ann_filtered_selective",  // ann_filtered_search at ~1% selectivity —
                               //   identical plan shape
    "ann_filtered_widen")      // the widened re-run is the same pruned
                               //   serve (assignCells/probeCells 1-row
                               //   broadcasts); the starved first attempt
                               //   materializes eagerly at build time

  test("no gate query plans a cartesian product; BNLJ only where whitelisted") {
    val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, dir).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      val cartesian = plan.contains("CartesianProduct")
      val bnlj = plan.contains("BroadcastNestedLoopJoin") && !bnljAllowed.contains(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (bnlj) Some(s"$name: BroadcastNestedLoopJoin (not whitelisted)")
      else None
    }
    assert(offenders.isEmpty, s"plan lint failures:\n${offenders.mkString("\n")}")
  }

  // The eager dedup operators (minHashDuplicates / jaccardJoin /
  // minHashIncremental) materialize before returning, so the gate-query
  // lint above only sees their checkpoint scan — lint the LAZY pipelines
  // directly so a future edit degrading the LSH/verify joins into a
  // nested loop still fails here.
  test("dedup operator pipelines (pre-materialization) plan no cartesian/BNLJ") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val corpus = docs.filter(col("doc_id") % 2 === 0)
    val fresh = docs.filter(col("doc_id") % 2 === 1)
    val pipelines = Seq(
      "minHashDuplicates" ->
        Dedup.minHashDuplicatesLazy(docs, col("doc_id"), col("text"), 3, 0.5),
      "jaccardJoin" ->
        Dedup.jaccardJoinLazy(docs, col("doc_id"), col("text"), 3, 0.5),
      "minHashIncremental" ->
        Dedup.minHashIncrementalLazy(corpus, fresh, col("doc_id"), col("text"), 3, 0.5))
    val offenders = pipelines.flatMap { case (name, (result, intermediates)) =>
      val plan = result.queryExecution.executedPlan.toString
      // planning registered the intermediates' (lazy) persist markers —
      // drop them so this lint leaves no cache state behind
      intermediates.foreach(_.unpersist(blocking = false))
      if (plan.contains("CartesianProduct")) Some(s"$name: CartesianProduct")
      else if (plan.contains("BroadcastNestedLoopJoin")) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"dedup pipeline lint failures:\n${offenders.mkString("\n")}")
  }
}
