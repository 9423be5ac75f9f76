package graft

import org.apache.spark.sql.functions._

import graft.operators.{PqParams, VectorIndex}

/** Dedicated A/B measurement for the id→cell discovery sidecar (VERDICT
  * r15 #4): a PRODUCTION-SHAPED change batch — a handful of ids against a
  * large corpus, the micro-batch steady state — applied to the same
  * persisted index twice, once discovering through the sidecar and once
  * through the legacy full-codes scan (sidecar deleted). Emits one JSON
  * line with wall time and task-level input bytes for each arm.
  *
  * Why not a registry gate: the existing `ann_ivfpq_upsert` gate's change
  * batch is modulo-derived, so at the 1000× tier it touches ~every cell by
  * construction — the right CORRECTNESS shape (maximal rewrite coverage)
  * but the wrong shape to show discovery pruning, which only matters when
  * the batch is small relative to the corpus. This main pins the scale
  * claim ("discovery reads sidecar buckets + touched cells, not the whole
  * index") with the batch shape the claim is about, against the same
  * synthesized tier the sf100 artifacts use. Correctness of both arms is
  * asserted inline: post-upsert answers must be identical across arms.
  *
  * Usage (solo, like every bench):
  *   SPARK_GRAFT_SCALE_DIR=/tmp/graft_sf100 \
  *     sbt -batch "runMain graft.UpsertBench BENCH_rNN_upsert_sidecar.json"
  */
object UpsertBench {

  // the production operating point the ann_* gates share (SimilarityQueries
  // prodPq / ivfProdK): m·subDim covers the 64-dim embeddings
  private val pq = PqParams(m = 4, subDim = 16, k = 16)

  def main(args: Array[String]): Unit = {
    // This A/B compares the two discovery ROUTES; the small-index size
    // bypass (VectorIndex.sidecarReadMinBytes) would otherwise silently
    // turn the sidecar arm into a second fallback arm on a tier whose
    // codes directory compresses under the threshold.
    sys.props("graft.sidecar.read.min.bytes") = "0"
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf100")
    val artifact = args.headOption.getOrElse("BENCH_upsert_sidecar.json")
    val spark = LocalSession.build()
    Bench.calibrationProbe() // discard: probe-loop JIT warmup
    val probeBefore = Bench.settledProbe()

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = emb.count()
    // fixed ids (replica 0 of every tier): 4 updates + 2 deletes, all above
    // the training-seed range so the frozen quantizer is undisturbed
    val updIds = Seq(101L, 113L, 127L, 139L)
    val delIds = Seq(149L, 163L)
    val updates = emb.filter(col("vec_id").isin(updIds: _*))
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val deletes = emb.filter(col("vec_id").isin(delIds: _*)).select(col("vec_id"))

    // one shared build (train/encode/write — the expensive fixed cost),
    // then a hardlink copy per arm so both mutate a pristine twin
    val base = java.nio.file.Files.createTempDirectory("graft_upsert_ab").toString
    val quant = VectorIndex.train(emb, col("vec_id"), col("embedding"),
      kCells = 64, iters = 2, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(emb, col("vec_id"), col("embedding"), quant), base)

    // the hardlink-vs-copy policy lives in ONE place (ADVICE r16): reuse
    // AnnFixtures' copy — same .parquet-only linking rule the mutation
    // gates depend on — instead of a drift-prone private re-implementation
    import graft.queries.AnnFixtures.{copyDir, rm}

    val meter = org.apache.spark.graftshim.TaskInputBytes.install(spark.sparkContext)
    final case class Arm(sec: Double, bytes: Long, discovery: String,
        answers: Seq[org.apache.spark.sql.Row])
    def runArm(dropSidecar: Boolean): Arm = {
      val path = java.nio.file.Files.createTempDirectory("graft_upsert_arm").toString
      copyDir(new java.io.File(base), new java.io.File(path))
      if (dropSidecar) rm(new java.io.File(s"$path/idmap"))
      spark.catalog.clearCache()
      VectorIndex.lastUpsertDiscovery = None
      val b0 = meter.snapshot(spark.sparkContext)
      val t0 = System.nanoTime()
      VectorIndex.upsertBatch(spark, path, updates, deletes,
        col("vec_id"), col("embedding"), pq)
      val sec = (System.nanoTime() - t0) / 1e9
      val bytes = meter.snapshot(spark.sparkContext) - b0
      val queries = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val snap = VectorIndex.snapshot(spark, path)
      val answers = VectorIndex.searchAdcPruned(
        VectorIndex.loadCodes(spark, snap),
        VectorIndex.loadQuantizer(spark, snap, pq), queries,
        nprobe = 8, topK = 5).orderBy("query_id", "rn").collect().toSeq
      val disc = VectorIndex.lastUpsertDiscovery
        .map(d => s"sidecar=${d.usedSidecar} buckets=${d.bucketsRead}/${d.totalBuckets}")
        .getOrElse("none")
      rm(new java.io.File(path))
      Arm(sec, bytes, disc, answers)
    }

    val sidecar = runArm(dropSidecar = false)
    val fallback = runArm(dropSidecar = true)
    require(sidecar.answers == fallback.answers && sidecar.answers.nonEmpty,
      "both arms must converge to identical post-upsert answers")
    require(sidecar.discovery.startsWith("sidecar=true"),
      s"sidecar arm must discover through the sidecar: ${sidecar.discovery}")
    require(fallback.discovery.startsWith("sidecar=false"),
      s"fallback arm must full-scan: ${fallback.discovery}")
    rm(new java.io.File(base))
    val probeAfter = Bench.settledProbe()
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val json =
      s"""{"metric":"upsert_sidecar_ab","unit":"sec","corpus_vecs":$nVecs,""" +
      s""""batch_ids":${updIds.size + delIds.size},""" +
      s""""sidecar":{"sec":${fmt(sidecar.sec)},"bytes":${sidecar.bytes},"discovery":"${sidecar.discovery}"},""" +
      s""""fallback":{"sec":${fmt(fallback.sec)},"bytes":${fallback.bytes},"discovery":"${fallback.discovery}"},""" +
      s""""calibration":{"before":${fmt(probeBefore)},"after":${fmt(probeAfter)}},""" +
      s""""scale_dir":"$dir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(artifact), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
