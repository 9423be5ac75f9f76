package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Round-13 index-lifecycle hardening:
  *
  *  - the applySplit crash window AFTER the cents overwrite (r12 ADVICE
  *    high): recovery must not duplicate the child centroids;
  *  - appendSink self-recovery from a crashed auto-compaction (r12 ADVICE
  *    medium): the stream must come back up without manual surgery;
  *  - a one-member hot cell maps to NeedsRetrain instead of an exception
  *    (r12 ADVICE low), with the index untouched;
  *  - the adopted-index edge warning in batchApplied (r12 VERDICT #8);
  *  - the single-writer maintenance lease (r12 VERDICT #4): concurrent
  *    writers fail fast, crashed holders expire, re-entrancy works;
  *  - reindex (r12 VERDICT #3): rebuild-equivalence, replay-marker
  *    survival, crash recovery for every swap window, and the drift
  *    response restoring a violated probe-cost bound.
  */
class VectorIndexLifecycleSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val pq = PqParams(m = 4, subDim = 16, k = 16)
  private val dim = 64

  import spark.implicits._

  private def fsOf(path: String) = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
  private def hp(path: String, n: String) = new org.apache.hadoop.fs.Path(s"$path/$n")
  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** 8 spike outliers (one k-means seed cell each) + a bimodal 28+28 huddle
    * that lands in one hot cell — the split fixture shape of
    * VectorIndexSpec, reproduced small.
    */
  private def bimodalCorpus() = {
    val rnd = new scala.util.Random(11)
    ((0 until 8).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d == i) 50f else 0f) + rnd.nextFloat() * 0.01f))
    } ++ (8 until 36).map { i =>
      (i.toLong, Array.tabulate(dim)(_ => rnd.nextFloat() * 0.01f))
    } ++ (36 until 64).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d >= 10 && d <= 20) 5f else 0f) + rnd.nextFloat() * 0.01f))
    }).toDF("vec_id", "embedding")
  }

  private def build(corpus: org.apache.spark.sql.DataFrame, path: String,
      kCells: Int = 8, iters: Int = 2): Unit = {
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = kCells, iters = iters, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant), path)
  }

  private def answers(path: String, corpus: org.apache.spark.sql.DataFrame,
      nprobe: Int = 3) = VectorIndex.searchAdc(
    VectorIndex.loadCodes(spark, path), VectorIndex.loadQuantizer(spark, path, pq),
    corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
    nprobe = nprobe, topK = 5).orderBy("query_id", "rn").collect().toSeq

  test("recoverSplit from the crash window AFTER the cents overwrite: no duplicated centroids, no duplicated codes") {
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_split_postcents")
    build(corpus, path)
    val VectorIndex.Split(parent, children) = VectorIndex.splitHottestCell(
      spark, path, corpus, col("vec_id"), col("embedding"), pq, maxCellRows = 10L)
    val centsClean = spark.read.parquet(VectorIndex.snapshot(spark, path).partPath("cents"))
      .collect().map(r => r.getLong(0)).sorted.toSeq
    val cleanAnswers = answers(path, corpus)

    // SIMULATE the crash: the split's cents overwrite landed (the table is
    // already post-split) but the manifest delete was lost — re-stage the
    // exact manifest the original run staged (parent + the two children,
    // whose centroids now live in the cents table)
    val childCents = spark.read.parquet(VectorIndex.snapshot(spark, path).partPath("cents"))
      .filter(col("cent_id").isin(children: _*))
      .orderBy("cent_id").collect()
    childCents.map(r => (parent, r.getLong(0),
        r.getAs[scala.collection.Seq[Double]]("cent").toSeq))
      .toSeq.toDF("parent", "cent_id", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/split_staging")

    VectorIndex.recoverSplit(spark, path, corpus, col("vec_id"), col("embedding"), pq)

    assert(!new java.io.File(s"$path/split_staging").exists(),
      "recovery must consume the manifest")
    val centIds = spark.read.parquet(VectorIndex.snapshot(spark, path).partPath("cents"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(centIds == centIds.distinct,
      s"recovery from the post-cents-overwrite window must not duplicate child centroids, got $centIds")
    assert(centIds == centsClean, "centroid table must equal the cleanly-split one")
    val dupCodes = VectorIndex.loadCodes(spark, path)
      .groupBy("vec_id", "m").count().filter(col("count") > 1).count()
    assert(dupCodes == 0, "no duplicated code rows after recovery")
    assert(answers(path, corpus) == cleanAnswers,
      "recovered index must answer exactly like the cleanly-split one")
  }

  test("appendSink self-recovers a crashed auto-compaction half-swap before touching the index") {
    val corpus = bimodalCorpus().filter(col("vec_id") < 48)
    val fresh = bimodalCorpus().filter(col("vec_id") >= 48)
    val path = tmp("graft_sink_halfswap")
    build(corpus, path)
    val fs = fsOf(path)
    // the compaction crash window: codes renamed away, stage complete
    // (carries parquet's _SUCCESS marker from the original write)
    fs.rename(hp(path, "codes"), hp(path, "codes_compacting"))
    fs.mkdirs(hp(path, "codes_old"))

    val sink = VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"),
      streamId = Some("lineage1"), autoCompactFilesPerCell = Some(50))
    sink(fresh, 0L) // must not throw on the missing codes/ directory

    assert(fs.exists(hp(path, "codes")) && !fs.exists(hp(path, "codes_old")) &&
      !fs.exists(hp(path, "codes_compacting")),
      "the sink must roll the half-swap forward on entry")
    val n = VectorIndex.loadCodes(spark, path).select("vec_id").distinct().count()
    assert(n == 64L, s"the batch must have been appended after recovery, got $n vectors")
  }

  test("a one-member hot cell yields NeedsRetrain, not an exception, and leaves the index untouched") {
    val corpus = (0 until 3).map { i =>
      (i.toLong, Array.tabulate(dim)(d => if (d == i) 50f else 0f))
    }.toDF("vec_id", "embedding")
    val path = tmp("graft_split_onemember")
    build(corpus, path, kCells = 3, iters = 1)
    val centsBefore = spark.read.parquet(s"$path/cents").collect().map(_.getLong(0)).toSet

    // maxCellRows=0 forces the policy to act on a 1-member hottest cell
    val outcome = VectorIndex.splitHottestCell(spark, path, corpus,
      col("vec_id"), col("embedding"), pq, maxCellRows = 0L)
    outcome match {
      case VectorIndex.NeedsRetrain(_, rows) => assert(rows == 1L)
      case other => fail(s"expected NeedsRetrain for a 1-member cell, got $other")
    }
    assert(spark.read.parquet(s"$path/cents").collect().map(_.getLong(0)).toSet
      == centsBefore, "the index must be untouched")
    assert(!new java.io.File(s"$path/split_staging").exists(),
      "nothing may have been staged")
    // the raw operator still throws the TYPED exception for direct callers
    val hot = VectorIndex.occupancy(spark, path)
      .orderBy(col("n_vecs").desc, col("cell")).limit(1)
      .select(col("cell").cast("long")).head().getLong(0)
    intercept[VectorIndex.UnsplittableCellException] {
      VectorIndex.splitCell(spark, path, hot, corpus, col("vec_id"), col("embedding"), pq)
    }
  }

  test("batchApplied warns (observably) when a streamId is supplied over a stamp-less index") {
    val corpus = bimodalCorpus().filter(col("vec_id") < 48)
    val batch = bimodalCorpus().filter(col("vec_id") >= 48)
    val path = tmp("graft_adopted")
    build(corpus, path)
    // legacy unscoped ingest: rows get __batch but no __stream
    VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"))(
      batch.filter(col("vec_id") < 56), 0L)
    val before = VectorIndex.adoptedIndexWarnings.get()
    // adopt the index under a NEW stream identity: no applied_batch_s marker
    // and no __stream column → the data-derived fallback is dark; the
    // warning must fire and the fresh lineage's batch must still apply
    VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"),
      streamId = Some("adopted-lineage"))(batch.filter(col("vec_id") >= 56), 0L)
    assert(VectorIndex.adoptedIndexWarnings.get() > before,
      "the adopted-index edge warning must fire")
    assert(VectorIndex.loadCodes(spark, path).select("vec_id").distinct().count() == 64L,
      "the new lineage's first batch must not be skipped")
  }

  test("writer lease: concurrent writers fail fast, a crashed holder's lease expires, release reopens the index") {
    val corpus = bimodalCorpus()
    val path = tmp("graft_lease")
    build(corpus, path)
    val fs = fsOf(path)

    // hold the lease from ANOTHER thread (a live concurrent writer)
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      VectorIndex.withWriterLease(spark, path, "spec-holder") {
        started.countDown(); release.await()
      })
    holder.start()
    assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
    val freshRows = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id") + 100 as "vec_id", col("embedding"))
    intercept[VectorIndex.ConcurrentIndexWriterException] {
      VectorIndex.appendBatch(spark, path, freshRows, col("vec_id"), col("embedding"), pq)
    }
    intercept[VectorIndex.ConcurrentIndexWriterException] {
      VectorIndex.compactCells(spark, path)
    }
    release.countDown(); holder.join()
    assert(!fs.exists(hp(path, "maintenance_lease")), "release must delete the lease")

    // a CRASHED holder: lease file exists but its age exceeds the TTL —
    // the next writer reclaims it instead of deadlocking forever
    val out = fs.create(hp(path, "maintenance_lease"), false)
    out.write("dead-holder crashed 0\n".getBytes("UTF-8")); out.close()
    intercept[VectorIndex.ConcurrentIndexWriterException] {
      VectorIndex.refreshOccupancy(spark, path) // fresh lease: refused
    }
    assert(new java.io.File(s"$path/maintenance_lease")
      .setLastModified(System.currentTimeMillis() - 11 * 60 * 1000L))
    VectorIndex.refreshOccupancy(spark, path) // stale lease: reclaimed
    assert(!fs.exists(hp(path, "maintenance_lease")),
      "the reclaimed lease must be released after the op")

    // re-entrancy end-to-end: splitHottestCell (outer lease) drives
    // splitCell → recoverSplit → upsert machinery without self-deadlock
    val outcome = VectorIndex.splitHottestCell(spark, path, corpus,
      col("vec_id"), col("embedding"), pq, maxCellRows = 10L)
    assert(outcome.isInstanceOf[VectorIndex.Split], s"got $outcome")
  }

  test("reindex: staged retrain swap ≡ cold rebuild; replay markers survive the swap") {
    val corpus = bimodalCorpus().filter(col("vec_id") < 48).cache()
    val fresh = bimodalCorpus().filter(col("vec_id") >= 48).cache()
    val path = tmp("graft_reindex")
    build(corpus, path, kCells = 8)
    // stream a batch in under a lineage identity, so a replay marker exists
    VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"),
      streamId = Some("lineageR"))(fresh, 7L)
    val corpus2 = corpus.unionByName(fresh).cache()

    VectorIndex.reindex(spark, path, corpus2, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)

    // rebuild-equivalence: the live swapped index answers exactly like a
    // cold train+encode over the same corpus
    val cold = VectorIndex.train(corpus2, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val qs = corpus2.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val fromIndex = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), qs, nprobe = 3, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val fromCold = VectorIndex.searchAdc(
      VectorIndex.encode(corpus2, col("vec_id"), col("embedding"), cold),
      cold, qs, nprobe = 3, topK = 5).orderBy("query_id", "rn").collect().toSeq
    assert(fromIndex == fromCold, "reindexed index must equal the cold rebuild")
    assert(fromIndex.nonEmpty)
    // occupancy was rebuilt for the new cells and matches a recount
    assert(VectorIndex.occupancy(spark, path).orderBy("cell").collect().toSeq ==
      VectorIndex.cellOccupancy(VectorIndex.loadCodes(spark, path))
        .orderBy("cell").collect().toSeq)
    // no staging debris
    assert(!new java.io.File(s"$path/reindex_staging").exists())
    assert(!new java.io.File(s"$path/reindex_old").exists())

    // REPLAY SAFETY ACROSS REINDEX: batch 7's vectors are inside the
    // re-encoded corpus; the surviving high-water marker must refuse the
    // replay even though the new codes carry no __batch/__stream stamps
    val nBefore = VectorIndex.loadCodes(spark, path).count()
    VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"),
      streamId = Some("lineageR"))(fresh, 7L)
    assert(VectorIndex.loadCodes(spark, path).count() == nBefore,
      "a replayed pre-reindex batch must still be refused after the reindex")
  }

  test("recoverReindex: every crash window rolls forward or back; a reader-visible index exists throughout") {
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_reindex_crash")
    build(corpus, path, kCells = 8)
    val preAnswers = answers(path, corpus)

    // ROLL BACK: the staged build itself crashed (no _COMMITTED) — the
    // live index is authoritative, the stage is debris
    val fs = fsOf(path)
    fs.mkdirs(hp(path, "reindex_staging/cents"))
    val junk = fs.create(hp(path, "reindex_staging/cents/part-junk.parquet"), true)
    junk.write("partial".getBytes("UTF-8")); junk.close()
    VectorIndex.recoverReindex(spark, path)
    assert(!fs.exists(hp(path, "reindex_staging")), "partial stage must be dropped")
    assert(answers(path, corpus) == preAnswers, "roll-back must not touch the index")

    // ROLL FORWARD: a COMMITTED staged build (constructed exactly as
    // reindex stages it) with the crash falling mid-swap — live cents
    // already moved aside. recovery must finish the promote and converge
    // to the same state a clean reindex reaches (built on a twin copy).
    val twin = tmp("graft_reindex_twin")
    def copyDir(src: java.io.File, dst: java.io.File): Unit =
      if (src.isDirectory) { dst.mkdirs(); Option(src.listFiles()).toSeq.flatten
        .foreach(f => copyDir(f, new java.io.File(dst, f.getName))) }
      else { java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
    copyDir(new java.io.File(path), new java.io.File(twin))
    VectorIndex.reindex(spark, twin, corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val wantAnswers = answers(twin, corpus)

    // stage the same build by hand on the crashed index
    val quant2 = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val codes2 = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant2)
    val staging = s"$path/reindex_staging"
    quant2.cents.write.mode("overwrite").parquet(s"$staging/cents")
    quant2.csubs.write.mode("overwrite").parquet(s"$staging/codebook")
    codes2.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$staging/codes")
    VectorIndex.cellOccupancy(spark.read.parquet(s"$staging/codes"))
      .write.mode("overwrite").parquet(s"$staging/occupancy")
    fs.create(hp(path, "reindex_staging/_COMMITTED"), true).close()
    // simulate the mid-swap crash: live cents moved aside, not yet replaced
    fs.mkdirs(hp(path, "reindex_old"))
    fs.rename(hp(path, "cents"), hp(path, "reindex_old/cents"))

    VectorIndex.recoverReindex(spark, path)
    assert(!fs.exists(hp(path, "reindex_staging")) && !fs.exists(hp(path, "reindex_old")),
      "roll-forward must consume the stage and the old copies")
    assert(answers(path, corpus) == wantAnswers,
      "the rolled-forward index must answer exactly like a clean reindex")
  }

  test("drift response: reindex restores a probe-cost bound the stale quantizer violates; the policy then reports Balanced") {
    // stale world: 8 spike seeds, one cell each. Drift REPLACES half the
    // spikes with 4 tight 10-vector clusters far from every spike — under
    // the FROZEN stale quantizer they pile into few cells (the drift
    // signal); a fresh train (whose deterministic seeds now include one
    // point of each cluster) spreads them one cluster per cell.
    val rnd = new scala.util.Random(23)
    val spikes = (0 until 8).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d == i) 50f else 0f) + rnd.nextFloat() * 0.01f))
    }
    val path = tmp("graft_reindex_drift")
    build(spikes.toDF("vec_id", "embedding"), path, kCells = 8)

    // cluster j centered at -30 in dims 40+2j..41+2j — far from all spikes,
    // near each other (so the stale assignment lumps them together).
    // ids 8..11 are one point per cluster → they are among the first 8 ids
    // of the POST-drift corpus and seed the retrain.
    def clusterPoint(j: Int, k: Int): Array[Float] =
      Array.tabulate(dim)(d =>
        (if (d == 40 + 2 * j || d == 41 + 2 * j) -30f else 0f) + (k * 0.001f))
    val clusters = (0 until 4).flatMap { j =>
      (0 until 10).map { k =>
        val id = if (k == 0) 8L + j else 12L + j * 9 + (k - 1)
        (id, clusterPoint(j, k))
      }
    }
    val updates = clusters.toDF("vec_id", "embedding")
    val deletes = Seq(4L, 5L, 6L, 7L).toDF("vec_id")
    VectorIndex.upsertBatch(spark, path, updates, deletes,
      col("vec_id"), col("embedding"), pq)

    val staleMax = VectorIndex.occupancyReport(spark, path).head().getAs[Long]("max_cell")
    assert(staleMax >= 20L,
      s"drift must violate the bound under the stale quantizer, got max_cell=$staleMax")

    val corpus2 = spikes.filter(_._1 < 4).toDF("vec_id", "embedding")
      .unionByName(updates)
    VectorIndex.reindex(spark, path, corpus2, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)

    val report = VectorIndex.occupancyReport(spark, path).head()
    assert(report.getAs[Long]("max_cell") <= 12L,
      s"retraining must spread the drifted mass, got ${report.getAs[Long]("max_cell")}")
    assert(VectorIndex.splitHottestCell(spark, path, corpus2,
      col("vec_id"), col("embedding"), pq, maxCellRows = 12L) == VectorIndex.Balanced,
      "post-reindex the policy must report Balanced at the bound drift violated")
    // and the swapped index still answers like a cold rebuild
    val cold = VectorIndex.train(corpus2, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val qs = corpus2.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val a = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), qs, nprobe = 3, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val b = VectorIndex.searchAdc(
      VectorIndex.encode(corpus2, col("vec_id"), col("embedding"), cold), cold,
      qs, nprobe = 3, topK = 5).orderBy("query_id", "rn").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("NeedsRetrain → reindex: the documented response restores a clean k-cell layout (the irreducible duplicate mass stays irreducible — a dedup problem, not a quantizer one)") {
    // A 10-copy IDENTICAL group: NO quantizer — stale, split-refined, or
    // freshly trained — can spread identical vectors across cells, so
    // "NeedsRetrain then reindex then Balanced at the OLD bound" is
    // mathematically unsatisfiable (NeedsRetrain requires group > bound;
    // any quantizer keeps the group together). The honest protocol, pinned
    // here: the split loop ends in NeedsRetrain; reindex restores a clean
    // k-cell layout (the loop's splits had inflated the cell count);
    // Balanced holds at the FEASIBLE bound — the largest duplicate
    // multiplicity, which is the floor any quantizer can reach. Mass
    // beyond that is exact-duplicate data and belongs to Dedup.
    val rnd = new scala.util.Random(31)
    val same = Array.tabulate(dim)(d => if (d >= 30 && d <= 34) -20f else 0f)
    val corpus = ((0 until 2).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d == i) 50f else 0f) + rnd.nextFloat() * 0.01f))
    } ++ (2 until 12).map(i => (i.toLong, same.clone())) ++
      (12 until 20).map { i =>
        (i.toLong, Array.tabulate(dim)(_ => rnd.nextFloat() * 0.01f))
      }).toDF("vec_id", "embedding").cache()
    val path = tmp("graft_retrain_protocol")
    build(corpus, path, kCells = 2)

    var outcome: VectorIndex.SplitOutcome = VectorIndex.Split(-1L, Nil)
    var steps = 0
    while (steps < 8 && outcome.isInstanceOf[VectorIndex.Split]) {
      outcome = VectorIndex.splitHottestCell(spark, path, corpus,
        col("vec_id"), col("embedding"), pq, maxCellRows = 6L)
      steps += 1
    }
    val flagged = outcome match {
      case VectorIndex.NeedsRetrain(cell, rows) => assert(rows >= 10L); cell
      case other => fail(s"the identical mass must end the loop in NeedsRetrain, got $other")
    }
    assert(flagged >= 0L)
    val cellsAfterLoop = spark.read.parquet(
      VectorIndex.snapshot(spark, path).partPath("cents")).count()
    assert(cellsAfterLoop > 2L, "the loop's splits must have inflated the cell count")

    // the documented response
    VectorIndex.reindex(spark, path, corpus, col("vec_id"), col("embedding"),
      kCells = 4, iters = 2, pq = pq)
    assert(spark.read.parquet(VectorIndex.snapshot(spark, path).partPath("cents")).count() == 4L,
      "reindex must restore a clean k-cell layout")
    // feasible bound = the duplicate multiplicity (10): Balanced now holds
    assert(VectorIndex.splitHottestCell(spark, path, corpus,
      col("vec_id"), col("embedding"), pq, maxCellRows = 10L) == VectorIndex.Balanced)
    // and the identical mass is exactly one cell of 10 — the Dedup signal
    val maxCell = VectorIndex.occupancyReport(spark, path).head().getAs[Long]("max_cell")
    assert(maxCell == 10L, s"the irreducible duplicate group must be the hot cell, got $maxCell")
  }

  test("generation manifest: a reader looping through snapshots during a concurrent reindex never observes a mixed-generation index") {
    // r13 VERDICT #3: a query racing the old rename-swap could read cents
    // from the new index and codes from the old. Every read resolved
    // through one snapshot must now see a SINGLE committed generation:
    // while a reindex (kCells 2 → 8, materially different quantizer) runs,
    // every concurrent answer equals either the complete pre-reindex or the
    // complete post-reindex answer — never a hybrid, never an exception.
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_gen_reader")
    build(corpus, path, kCells = 2)
    val qs = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    def serve(): Seq[org.apache.spark.sql.Row] = {
      val snap = VectorIndex.snapshot(spark, path)
      VectorIndex.searchAdc(VectorIndex.loadCodes(spark, snap),
        VectorIndex.loadQuantizer(spark, snap, pq), qs, nprobe = 1, topK = 3)
        .orderBy("query_id", "rn").collect().toSeq
    }
    val ansBefore = serve()

    // EVERY answer the reader observes is buffered and validated AFTER the
    // race, against the then-known {ansBefore, ansAfter} pair — validating
    // inline against a not-yet-known ansAfter would make the check
    // vacuously true during the only window where a mixed-generation
    // answer can occur (mid-swap, before the post state is computable).
    val observed = new java.util.concurrent.ConcurrentLinkedQueue[Seq[org.apache.spark.sql.Row]]()
    val violations = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try observed.add(serve())
        catch {
          case t: Throwable => violations.add(s"reader threw: ${t.getClass.getName}: ${t.getMessage}")
        }
      }
    })
    reader.start()
    VectorIndex.reindex(spark, path, corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val ansAfter = serve()
    // keep reading a little against the settled post-reindex index
    Thread.sleep(300)
    stop.set(true); reader.join()
    assert(ansAfter != ansBefore,
      "fixture must discriminate generations (different kCells ⇒ different answers)")
    assert(observed.size >= 3, s"reader must have raced the swap, got ${observed.size} iterations")
    import scala.jdk.CollectionConverters._
    observed.asScala.zipWithIndex.foreach { case (ans, i) =>
      if (ans != ansBefore && ans != ansAfter)
        violations.add(s"mixed-generation answer at iteration $i: $ans")
    }
    assert(violations.isEmpty, s"reader observed: ${violations.toArray.mkString("; ")}")
    // re-verify the settled index equals the cold rebuild
    val cold = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val coldAns = VectorIndex.searchAdc(
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), cold), cold,
      qs, nprobe = 1, topK = 3).orderBy("query_id", "rn").collect().toSeq
    assert(ansAfter == coldAns)
  }

  test("generation manifest: a legacy flat index upgrades on its first swap and retains exactly one previous generation") {
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_gen_upgrade")
    build(corpus, path)
    assert(VectorIndex.snapshot(spark, path).gen == 0L, "fresh index is generation 0 (flat)")
    assert(new java.io.File(s"$path/codes").isDirectory)
    val ans = answers(path, corpus)

    VectorIndex.compactCells(spark, path)
    val s1 = VectorIndex.snapshot(spark, path)
    assert(s1.gen == 1L && s1.dirs("codes") == "codes_gen_1",
      s"first swap must commit generation 1, got $s1")
    assert(new java.io.File(s"$path/codes").isDirectory,
      "the previous (flat) generation must be RETAINED for in-flight readers")
    assert(answers(path, corpus) == ans)

    VectorIndex.compactCells(spark, path)
    val s2 = VectorIndex.snapshot(spark, path)
    assert(s2.gen == 2L && s2.dirs("codes") == "codes_gen_2")
    assert(!new java.io.File(s"$path/codes").exists(),
      "the generation before the previous must be GC'd at the next commit")
    assert(new java.io.File(s"$path/codes_gen_1").isDirectory,
      "generation 1 is now the retained previous")
    assert(answers(path, corpus) == ans)

    // staged-but-uncommitted debris (a swap that crashed before its commit)
    // is dropped by recovery without touching the live generation
    new java.io.File(s"$path/codes_gen_99").mkdirs()
    VectorIndex.recoverCompaction(spark, path)
    assert(!new java.io.File(s"$path/codes_gen_99").exists(), "debris must be dropped")
    assert(answers(path, corpus) == ans)
  }

  test("recoverReindex rolls a committed-but-unpromoted staged build forward into one atomic manifest flip") {
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_gen_reindex_fwd")
    build(corpus, path, kCells = 2)
    val ansOld = answers(path, corpus)

    // hand-build the crash state: a COMPLETE staged retrain (kCells=8) with
    // the generation-stamped _COMMITTED marker, process dead before promote
    val quant2 = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val codes2 = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant2)
    val staging = s"$path/reindex_staging"
    quant2.cents.write.mode("overwrite").parquet(s"$staging/cents")
    quant2.csubs.write.mode("overwrite").parquet(s"$staging/codebook")
    codes2.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$staging/codes")
    VectorIndex.cellOccupancy(spark.read.parquet(s"$staging/codes"))
      .write.mode("overwrite").parquet(s"$staging/occupancy")
    val fs = fsOf(path)
    val out = fs.create(hp(path, "reindex_staging/_COMMITTED"), true)
    out.write("1\n".getBytes("UTF-8")); out.close()

    VectorIndex.recoverReindex(spark, path)

    val snap = VectorIndex.snapshot(spark, path)
    assert(snap.gen == 1L, "the promote must have committed generation 1")
    assert(Seq("cents", "codebook", "codes", "occupancy")
      .forall(p => snap.dirs(p) == s"${p}_gen_1"), s"all parts flip together, got ${snap.dirs}")
    assert(!fs.exists(hp(path, "reindex_staging")), "staging must be consumed")
    val ansNew = answers(path, corpus)
    assert(ansNew != ansOld, "the promoted retrain must be live")
    // idempotent: a second recovery call is a no-op
    VectorIndex.recoverReindex(spark, path)
    assert(VectorIndex.snapshot(spark, path).gen == 1L)
    assert(answers(path, corpus) == ansNew)
  }

  test("lease release is ownership-checked: a reclaimed lease survives release and the op aborts loudly") {
    // r13 ADVICE (medium): a writer whose op outlives the TTL kept mutating
    // after a reclaimer took over, and its finally-block deleted the
    // RECLAIMER's lease — silently admitting a third writer. Now the
    // release deletes only a lease this writer still owns, and an op that
    // lost its lease exits with LostIndexLeaseException instead of
    // pretending it completed cleanly.
    val path = tmp("graft_lease_own")
    build(bimodalCorpus(), path)
    val fs = fsOf(path)
    val ex = intercept[VectorIndex.LostIndexLeaseException] {
      VectorIndex.withWriterLease(spark, path, "slow-op") {
        // simulate the TTL reclaim firing mid-op: a reclaimer replaces the
        // lease with its own
        val out = fs.create(hp(path, "maintenance_lease"), true)
        out.write("reclaimer-holder reclaimed-op 0\n".getBytes("UTF-8")); out.close()
      }
    }
    assert(ex.observed.startsWith("reclaimer-holder"))
    // the reclaimer's lease must survive this writer's release
    val content = {
      val in = fs.open(hp(path, "maintenance_lease"))
      try { val b = new Array[Byte](64); val n = in.read(b); new String(b, 0, n, "UTF-8") }
      finally in.close()
    }
    assert(content.startsWith("reclaimer-holder"),
      "release must never delete a lease it does not own")
    fs.delete(hp(path, "maintenance_lease"), false)
  }

  test("lease heartbeat: a live holder's lease never goes stale, however long the op runs") {
    // r13 VERDICT #7: the TTL reclaim could fire against an alive-but-slow
    // holder (a long encode inside reindex). The heartbeat re-stamps the
    // lease every ttl/3, so a contender arriving after 2x the TTL still
    // sees a FRESH lease and fails fast instead of reclaiming.
    val path = tmp("graft_lease_beat")
    build(bimodalCorpus(), path)
    spark.conf.set("spark.graft.index.leaseTtlMs", "900")
    try {
      val started = new java.util.concurrent.CountDownLatch(1)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val holder = new Thread(() =>
        try VectorIndex.withWriterLease(spark, path, "slow-holder") {
          started.countDown()
          Thread.sleep(2500) // ~3x the TTL: without heartbeats this lease is long stale
        } catch { case t: Throwable => failure.set(t) })
      holder.start()
      assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
      Thread.sleep(2000) // let the TTL elapse twice over
      intercept[VectorIndex.ConcurrentIndexWriterException] {
        VectorIndex.refreshOccupancy(spark, path) // must NOT reclaim a heartbeating lease
      }
      holder.join()
      assert(failure.get() == null,
        s"the slow holder must complete cleanly (lease never lost): ${failure.get()}")
      VectorIndex.refreshOccupancy(spark, path) // released: next writer proceeds
    } finally spark.conf.unset("spark.graft.index.leaseTtlMs")
  }

  test("heartbeat re-stamp never clobbers a completed reclaim (r14 VERDICT #4)") {
    // The r14 residual race: the beat's read-then-create(overwrite) could
    // land its write AFTER a reclaimer completed its full tombstone cycle,
    // replacing the reclaimer's fresh lease with the old holder's — two
    // JVMs each believing they own the index, re-affirmed every beat. The
    // re-stamp is now an mtime-only setTimes: it cannot rewrite content, so
    // every interleaving leaves EXACTLY ONE surviving writer.
    val path = tmp("graft_lease_restamp")
    val fs = fsOf(path)
    val p = hp(path, "maintenance_lease")
    def writeLease(c: String): Unit = {
      val out = fs.create(p, true); out.write(c.getBytes("UTF-8")); out.close()
    }
    def readBack(): String = {
      val in = fs.open(p)
      try { val b = new Array[Byte](64); val n = in.read(b); new String(b, 0, n, "UTF-8") }
      finally in.close()
    }
    // arm 1 — our live lease: Stamped; mtime bumped, content UNTOUCHED
    writeLease("me myop 1\n")
    fs.setTimes(p, System.currentTimeMillis() - 60000L, -1)
    val before = fs.getFileStatus(p).getModificationTime
    assert(VectorIndex.restampLease(fs, p, "me myop") == VectorIndex.RestampResult.Stamped)
    assert(fs.getFileStatus(p).getModificationTime > before, "re-stamp must bump mtime")
    assert(readBack().startsWith("me myop 1"), "re-stamp must not rewrite content")

    // arm 2 — the race injected at its worst: a reclaim COMPLETED and a
    // foreign lease sits at the path. The beat must report Lost and leave
    // the reclaimer's lease byte-identical (the old overwrite clobbered it).
    writeLease("reclaimer rop 2\n")
    assert(VectorIndex.restampLease(fs, p, "me myop") == VectorIndex.RestampResult.Lost)
    assert(readBack().startsWith("reclaimer rop 2"),
      "exactly one surviving writer: the reclaimer's lease must survive the beat untouched")

    // arm 3 — mid-cycle (lease renamed away by an in-flight reclaim):
    // Transient, and the beat must NOT create anything at the path
    fs.delete(p, false)
    assert(VectorIndex.restampLease(fs, p, "me myop") == VectorIndex.RestampResult.Transient)
    assert(!fs.exists(p), "re-stamp must never vacate-and-recreate the lease path")
  }

  test("a reclaim landing mid-op survives the live heartbeat end-to-end") {
    // Integration arm of the re-stamp fix: while an op's heartbeat is LIVE
    // (beating every ttl/3), forcibly install a reclaimer's lease. Under the
    // old overwrite re-stamp the very next beat rewrote it; now the beats
    // observe Lost, the foreign lease stays byte-identical through several
    // beat periods, and the op exits with LostIndexLeaseException.
    val path = tmp("graft_lease_midop")
    build(bimodalCorpus(), path)
    val fs = fsOf(path)
    val p = hp(path, "maintenance_lease")
    spark.conf.set("spark.graft.index.leaseTtlMs", "600") // beat every 200ms
    try {
      val ex = intercept[VectorIndex.LostIndexLeaseException] {
        VectorIndex.withWriterLease(spark, path, "clobber-victim") {
          val out = fs.create(p, true)
          out.write("reclaimer-holder rop 0\n".getBytes("UTF-8")); out.close()
          Thread.sleep(900) // ≥4 beat periods fire against the foreign lease
          val in = fs.open(p)
          val content = try {
            val b = new Array[Byte](64); val n = in.read(b); new String(b, 0, n, "UTF-8")
          } finally in.close()
          assert(content.startsWith("reclaimer-holder rop 0"),
            s"a live heartbeat must never clobber the reclaimer's lease, saw: $content")
        }
      }
      assert(ex.observed.startsWith("reclaimer-holder"))
      assert({
        val in = fs.open(p)
        try { val b = new Array[Byte](64); val n = in.read(b); new String(b, 0, n, "UTF-8").startsWith("reclaimer-holder") }
        finally in.close()
      }, "the reclaimer's lease survives the aborted op's release too")
      fs.delete(p, false)
    } finally spark.conf.unset("spark.graft.index.leaseTtlMs")
  }

  test("appendSink serializes on a held lease with backoff instead of killing the stream") {
    // r13 ADVICE (medium): two live lineages' micro-batches can overlap;
    // fail-fast inside foreachBatch terminated the losing streaming query.
    // The sink now retries with bounded backoff — the batch lands once the
    // holder releases.
    val corpus = bimodalCorpus()
    val path = tmp("graft_lease_sink")
    build(corpus, path)
    val before = VectorIndex.loadCodes(spark, path).select("vec_id").distinct().count()
    val fresh = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id") + 500 as "vec_id", col("embedding"))
    val release = new java.util.concurrent.CountDownLatch(1)
    val started = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      VectorIndex.withWriterLease(spark, path, "overlapping-lineage") {
        started.countDown(); release.await()
      })
    holder.start()
    assert(started.await(30, java.util.concurrent.TimeUnit.SECONDS))
    // release the lease while the sink is backing off
    new Thread(() => { Thread.sleep(1200); release.countDown() }).start()
    VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"),
      streamId = Some("lineageB"))(fresh, 0L) // must WAIT, then apply
    holder.join()
    assert(VectorIndex.loadCodes(spark, path).select("vec_id").distinct().count()
      == before + 2, "the blocked batch must land after the lease frees")

    // bounded: a lease held past sinkLeaseWaitMs rethrows the contention
    spark.conf.set("spark.graft.index.sinkLeaseWaitMs", "400")
    try {
      val release2 = new java.util.concurrent.CountDownLatch(1)
      val started2 = new java.util.concurrent.CountDownLatch(1)
      val holder2 = new Thread(() =>
        VectorIndex.withWriterLease(spark, path, "wedged-holder") {
          started2.countDown(); release2.await()
        })
      holder2.start()
      assert(started2.await(30, java.util.concurrent.TimeUnit.SECONDS))
      intercept[VectorIndex.ConcurrentIndexWriterException] {
        VectorIndex.appendSink(path, pq, col("vec_id"), col("embedding"),
          streamId = Some("lineageC"))(fresh, 1L)
      }
      release2.countDown(); holder2.join()
    } finally spark.conf.unset("spark.graft.index.sinkLeaseWaitMs")
  }

  test("selective filtered search: a rare predicate still fills the full top-k when the probed cells hold ≥k matches") {
    // 2 far clusters; queries sit in cluster A; 8 of A's 24 members carry
    // the rare tag (~selective in-cluster, rare globally). nprobe covers
    // A's cell, which holds ≥5 matches → the filtered top-k must return
    // EXACTLY k matching rows, never fewer (no post-filter starvation).
    val rnd = new scala.util.Random(41)
    val corpus = ((0 until 24).map { i =>
      (i.toLong, Array.tabulate(dim)(_ => rnd.nextFloat() * 0.01f),
        if (i >= 4 && i < 12) 1 else 0) // 8 rare rows in cluster A
    } ++ (24 until 48).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d < 8) 40f else 0f) + rnd.nextFloat() * 0.01f), 0)
    }).toDF("vec_id", "embedding", "rare").cache()
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 4, iters = 2, pq = pq)
    val codes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant,
      meta = Seq("rare"))
    val qs = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val got = VectorIndex.searchAdcPruned(codes, quant, qs,
      nprobe = 2, topK = 5, predicate = Some(col("rare") === 1)).collect()
    val perQuery = got.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.keySet == Set(0L, 1L) && perQuery.values.forall(_ == 5),
      s"every query must fill its full top-5 from the ≥5 in-probe matches, got $perQuery")
    val rareIds = (4L until 12L).toSet
    assert(got.forall(r => rareIds.contains(r.getLong(1))),
      "every returned neighbor must carry the rare tag")

    // no shortfall here: the probed cells held ≥k matches
    val full = VectorIndex.searchAdcPruned(codes, quant, qs,
      nprobe = 2, topK = 5, predicate = Some(col("rare") === 1))
    full.collect()
    assert(VectorIndex.prunedShortfall(full) == Some(0L))

    // STARVATION accounting (r13 VERDICT #6): a predicate with only 2
    // matches anywhere cannot fill top-5 — the <k return is now OBSERVABLE
    // (shortfall = queries·topK − returned) instead of silent
    val ultraRare = VectorIndex.searchAdcPruned(
      codes.withColumn("rare", (col("vec_id") < 2).cast("int")), quant, qs,
      nprobe = 2, topK = 5, predicate = Some(col("rare") === 1))
    val starved = ultraRare.collect()
    assert(starved.length < 2 * 5, "fixture must actually starve")
    assert(VectorIndex.prunedShortfall(ultraRare) ==
      Some(2L * 5 - starved.length),
      "the filtered search must report exactly its unfilled top-k slots")

    // an UNFILTERED search attaches no observation (nothing can silently cap)
    val plain = VectorIndex.searchAdcPruned(codes, quant, qs,
      nprobe = 2, topK = 5, predicate = None)
    plain.collect()
    assert(VectorIndex.prunedShortfall(plain).isEmpty)

    // COMPOSABILITY: two filtered searches in ONE executed plan — Spark
    // requires observed-metric names unique per plan, so the observation
    // must carry a per-call suffix; prunedShortfall then SUMS the plan's
    // shortfalls (0 from the filled search + the starved one's deficit)
    val both = VectorIndex.searchAdcPruned(codes, quant, qs,
        nprobe = 2, topK = 5, predicate = Some(col("rare") === 1))
      .unionByName(VectorIndex.searchAdcPruned(
        codes.withColumn("rare", (col("vec_id") < 2).cast("int")), quant, qs,
        nprobe = 2, topK = 5, predicate = Some(col("rare") === 1)))
    val bothRows = both.collect()
    assert(VectorIndex.prunedShortfall(both) ==
      Some(2L * (2 * 5) - bothRows.length),
      "a plan composing two filtered searches must report their summed shortfall")
  }

  test("starvation-driven widening: a rare-label query that starves at nprobe=1 fills k at the widened probe (r14 VERDICT #6)") {
    val rnd = new scala.util.Random(23)
    // cluster A (near the queries) has NO rare rows; the 8 rare rows all
    // live in far cluster B — a narrow probe of A's cells finds zero
    // matches, the exact starvation the widening responds to
    val corpus = ((0 until 24).map { i =>
      (i.toLong, Array.tabulate(dim)(_ => rnd.nextFloat() * 0.01f), 0)
    } ++ (24 until 48).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d < 8) 40f else 0f) + rnd.nextFloat() * 0.01f),
        if (i < 32) 1 else 0) // 8 rare rows, all in cluster B
    }).toDF("vec_id", "embedding", "rare").cache()
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 4, iters = 2, pq = pq)
    val codes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant,
      meta = Seq("rare"))
    val qs = corpus.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

    // the narrow attempt genuinely starves (precondition, report-only path)
    val narrow = VectorIndex.searchAdcPruned(codes, quant, qs,
      nprobe = 1, topK = 5, predicate = Some(col("rare") === 1))
    val narrowRows = narrow.collect()
    assert(narrowRows.isEmpty, "fixture must starve completely at nprobe=1")
    assert(VectorIndex.prunedShortfall(narrow) == Some(10L))

    // widening fills the full top-k and records BOTH attempts
    val widened = VectorIndex.searchAdcPrunedWidening(codes, quant, qs,
      nprobe = 1, topK = 5, predicate = col("rare") === 1, widenTo = 4)
    val rows = widened.collect()
    val perQuery = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(perQuery.keySet == Set(0L, 1L) && perQuery.values.forall(_ == 5),
      s"the widened probe must fill top-5 per query, got $perQuery")
    val rareIds = (24L until 32L).toSet
    assert(rows.forall(r => rareIds.contains(r.getLong(1))),
      "every widened neighbor must carry the rare tag")
    assert(VectorIndex.wideningRecord(widened) == Some((1, 10L, 4)),
      "the record must carry the starved attempt (nprobe=1, shortfall=10) and the widened probe")
    assert(VectorIndex.prunedShortfall(widened) == Some(0L),
      "the widened attempt's own shortfall accounting rides the returned frame")

    // no-starvation path: plenty of matches inside the narrow probe → the
    // first attempt's result is returned with NO widening (record says so)
    val easy = VectorIndex.searchAdcPrunedWidening(codes, quant, qs,
      nprobe = 2, topK = 5, predicate = col("rare") === 0, widenTo = 4)
    val easyRows = easy.collect()
    assert(easyRows.groupBy(_.getLong(0)).values.forall(_.length == 5))
    assert(VectorIndex.wideningRecord(easy) == Some((2, 0L, 2)),
      "a filled first attempt must not widen")
  }

  test("write() on a generation-managed index is a staged atomic swap, not an in-place overwrite") {
    // The manifest's reader-atomicity contract must cover FULL REBUILDS
    // too: once an index has swapped generations, write() staging into the
    // live flat directories would hand a concurrent reader mixed parts.
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_gen_write")
    build(corpus, path, kCells = 2)
    VectorIndex.compactCells(spark, path) // upgrade to generation management
    val s1 = VectorIndex.snapshot(spark, path)
    assert(s1.gen >= 1L)

    val quant8 = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    VectorIndex.write(quant8,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant8), path)

    val s2 = VectorIndex.snapshot(spark, path)
    assert(s2.gen == s1.gen + 1, "the rebuild must commit the NEXT generation")
    assert(Seq("cents", "codebook", "codes", "occupancy")
      .forall(p => s2.dirs(p) == s"${p}_gen_${s2.gen}"),
      s"every part must resolve to the staged generation, got ${s2.dirs}")
    // the previous generation's directories survive one commit for
    // in-flight readers
    assert(s1.dirs.values.forall(d => fsOf(path).exists(hp(path, d))),
      "the superseded generation must be retained for in-flight readers")
    // and the rebuild is live: 8 cells now
    assert(spark.read.parquet(s2.partPath("cents")).count() == 8L)
  }

  test("appendBatch and upsertBatch settle a pending committed reindex before mutating") {
    // A crashed-but-committed reindex (staged build + _COMMITTED marker,
    // promote never ran) supersedes the live generation. A batch append or
    // upsert that lands in the OLD generation is silently destroyed when
    // the promote later rolls forward — so both entries must settle the
    // promote first, exactly like appendSink.
    val corpus = bimodalCorpus().cache()
    val path = tmp("graft_gen_append_settle")
    build(corpus, path, kCells = 2)

    // hand-build the crash state (same shape as the recoverReindex test)
    val quant8 = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    val codes8 = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant8)
    val staging = s"$path/reindex_staging"
    quant8.cents.write.mode("overwrite").parquet(s"$staging/cents")
    quant8.csubs.write.mode("overwrite").parquet(s"$staging/codebook")
    codes8.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$staging/codes")
    VectorIndex.cellOccupancy(spark.read.parquet(s"$staging/codes"))
      .write.mode("overwrite").parquet(s"$staging/occupancy")
    val out = fsOf(path).create(hp(path, "reindex_staging/_COMMITTED"), true)
    out.write("1\n".getBytes("UTF-8")); out.close()

    val fresh = Seq((100L, Array.tabulate(dim)(_ => 0.005f)))
      .toDF("vec_id", "embedding")
    VectorIndex.appendBatch(spark, path, fresh, col("vec_id"), col("embedding"), pq)

    val snap = VectorIndex.snapshot(spark, path)
    assert(snap.gen == 1L, "appendBatch must have promoted the pending reindex first")
    // codes carry one row per PQ subspace (m rows per vector) — count ids
    def ids(codes: org.apache.spark.sql.DataFrame, id: Long): Long =
      codes.filter(col("vec_id") === id).select("vec_id").distinct().count()
    assert(ids(VectorIndex.loadCodes(spark, snap), 100L) == 1L,
      "the appended vector must live in the PROMOTED generation, not the superseded one")

    // and the upsert path: update the appended row, delete one corpus row
    val upd = Seq((100L, Array.tabulate(dim)(_ => 0.009f)))
      .toDF("vec_id", "embedding")
    val del = Seq(0L).toDF("vec_id")
    VectorIndex.upsertBatch(spark, path, upd, del, col("vec_id"), col("embedding"), pq)
    val served = VectorIndex.loadCodes(spark, path)
    assert(ids(served, 100L) == 1L)
    assert(ids(served, 0L) == 0L)
  }
}
