package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The id→cell discovery sidecar contract (VERDICT r15 #4: upsert's
  * touched-cell discovery was one full codes scan per change batch — a full
  * index pass per micro-batch at 100 TB):
  *
  *  - [[VectorIndex.write]] builds the sidecar from birth; upsert discovery
  *    then reads ONLY the changed ids' hash-bucket directories (asserted by
  *    construction via the discovery record, not optimizer grace);
  *  - absence is always safe: delete the sidecar and discovery falls back
  *    to the legacy full scan with identical answers; [[VectorIndex.rebuildIdMap]]
  *    restores it;
  *  - the sidecar is a SUPERSET hint: a planted stale entry only adds a
  *    harmlessly-rewritten cell, never wrong answers;
  *  - appendBatch and reindex keep it current (append-first ordering /
  *    post-promote rebuild), so mutation after either still discovers
  *    through the sidecar and still converges to rebuild-equivalence.
  */
class VectorIndexSidecarSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val pq = PqParams(m = 4, subDim = 16, k = 16)

  // These contracts are about the sidecar ROUTE, so the small-index read
  // bypass (sidecarReadMinBytes, VERDICT r16 #3) is pinned OFF for the
  // suite's tiny fixtures; the bypass itself has its own test below.
  override def beforeAll(): Unit =
    sys.props("graft.sidecar.read.min.bytes") = "0"
  override def afterAll(): Unit = {
    sys.props.remove("graft.sidecar.read.min.bytes"); ()
  }

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def corpus = emb.filter(col("vec_id") % 10 =!= 7)
  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  private def freshIndex(): (String, IvfadcQuantizer) = {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_sidecar").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant), path)
    (path, quant)
  }

  /** Top-k answers of the persisted index vs a from-scratch encode of the
    * expected post-change corpus under the same frozen quantizer.
    */
  private def assertRebuildEquivalent(path: String, quant: IvfadcQuantizer,
      expected: org.apache.spark.sql.DataFrame): Unit = {
    val rebuilt = VectorIndex.encode(expected, col("vec_id"), col("embedding"), quant)
    val fromIndex = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 16, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val fromRebuild = VectorIndex.searchAdc(rebuilt, quant, queries, nprobe = 16, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    assert(fromIndex.nonEmpty)
    assert(fromIndex == fromRebuild,
      "index must answer exactly like the full re-encode of the post-change corpus")
  }

  private def updatesFor(ids: Seq[Long]) = corpus
    .filter(col("vec_id").isin(ids: _*))
    .select(col("vec_id"), reverse(col("embedding")).as("embedding"))

  private def postCorpus(updatedIds: Seq[Long], deletedIds: Seq[Long]) = corpus
    .filter(!col("vec_id").isin((updatedIds ++ deletedIds): _*))
    .select(col("vec_id"), col("embedding"))
    .union(updatesFor(updatedIds))

  test("write() builds the sidecar; discovery reads only the changed ids' buckets") {
    val (path, quant) = freshIndex()
    assert(new java.io.File(s"$path/idmap").isDirectory,
      "a written index must carry the discovery sidecar from birth")
    // bucket-partitioned layout, not a flat dump
    assert(Option(new java.io.File(s"$path/idmap").listFiles()).toSeq.flatten
      .exists(_.getName.startsWith("bucket=")))

    val updated = Seq(64L, 74L)
    val deleted = Seq(84L)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updatesFor(updated),
      spark.range(1).select(lit(deleted.head).as("vec_id")),
      col("vec_id"), col("embedding"), pq)

    val d = VectorIndex.lastUpsertDiscovery
    assert(d.exists(_.usedSidecar), s"discovery must go through the sidecar: $d")
    assert(d.exists(r => r.bucketsRead <= 3 && r.bucketsRead < r.totalBuckets),
      s"3 changed ids must read at most 3 of the ${VectorIndex.IdMapBuckets} " +
        s"bucket dirs: $d")
    assertRebuildEquivalent(path, quant, postCorpus(updated, deleted))
  }

  test("sidecar absent: full-scan fallback, same answers; rebuildIdMap restores it") {
    val (path, quant) = freshIndex()
    AnnFixturesAccess.rmDir(new java.io.File(s"$path/idmap"))
    val updated = Seq(94L)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updatesFor(updated),
      corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(!_.usedSidecar),
      "no sidecar → the legacy full-scan discovery")
    assertRebuildEquivalent(path, quant, postCorpus(updated, Nil))
    // a deleted sidecar never resurrects by itself (append-first is a no-op
    // while absent) — the explicit rebuild restores it
    assert(!new java.io.File(s"$path/idmap").exists())
    VectorIndex.rebuildIdMap(spark, path)
    assert(new java.io.File(s"$path/idmap").isDirectory)
    val updated2 = Seq(104L)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updatesFor(updated2),
      corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(_.usedSidecar))
    assertRebuildEquivalent(path, quant, postCorpus(updated ++ updated2, Nil))
  }

  test("superset safety: a planted stale entry only adds a rewritten cell") {
    val (path, quant) = freshIndex()
    import spark.implicits._
    // plant a bogus mapping: id 64 also "lives" in some other existing cell
    val bogusCell = VectorIndex.loadCodes(spark, path)
      .filter(col("vec_id") =!= 64L).select(col("cell").cast("long")).head().getLong(0)
    Seq((64L, bogusCell)).toDF("vec_id", "cell")
      .withColumn("bucket", pmod(xxhash64(col("vec_id")), lit(VectorIndex.IdMapBuckets.toLong)))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/idmap")
    val updated = Seq(64L)
    VectorIndex.upsertBatch(spark, path, updatesFor(updated),
      corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(_.usedSidecar))
    assertRebuildEquivalent(path, quant, postCorpus(updated, Nil))
  }

  test("appendBatch keeps the sidecar current: an appended id is discoverable") {
    val (path, quant) = freshIndex()
    val freshIds = Seq(67L, 77L) // the %10==7 slice excluded from corpus
    val fresh = emb.filter(col("vec_id").isin(freshIds: _*))
      .select(col("vec_id"), col("embedding"))
    VectorIndex.appendBatch(spark, path, fresh, col("vec_id"), col("embedding"), pq)
    // now DELETE one appended id — its old cell is only discoverable if the
    // append maintained the sidecar (discovery never scans the codes here)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path,
      corpus.limit(0).select(col("vec_id"), col("embedding")),
      spark.range(1).select(lit(67L).as("vec_id")),
      col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(_.usedSidecar))
    assert(VectorIndex.loadCodes(spark, path)
      .filter(col("vec_id") === 67L).count() == 0,
      "the appended-then-deleted id must be gone — its cell was found via the sidecar")
    assertRebuildEquivalent(path, quant,
      corpus.select(col("vec_id"), col("embedding"))
        .union(fresh.filter(col("vec_id") =!= 67L)))
  }

  test("below the size threshold reads bypass the sidecar, writes maintain it") {
    // force the bypass: every test fixture is far under a 1 TB threshold
    sys.props("graft.sidecar.read.min.bytes") = (1L << 40).toString
    val (path, quant) = freshIndex()
    try {
      val updated = Seq(64L)
      VectorIndex.lastUpsertDiscovery = None
      VectorIndex.upsertBatch(spark, path, updatesFor(updated),
        corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
      assert(VectorIndex.lastUpsertDiscovery.exists(!_.usedSidecar),
        "under the threshold the full scan IS the cheap discovery path")
      assert(new java.io.File(s"$path/idmap").isDirectory,
        "the bypass must not delete or stop maintaining the sidecar")
      assertRebuildEquivalent(path, quant, postCorpus(updated, Nil))
    } finally sys.props("graft.sidecar.read.min.bytes") = "0"
    // the bypassed mutation still appended its mapping (the superset
    // invariant must hold CONTINUOUSLY so reads are correct the moment the
    // index crosses the threshold): with the sidecar route back on, the
    // cell the bypassed upsert moved id 64 into is discoverable through
    // the sidecar alone — a missing entry would leave the moved row alive
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path,
      corpus.limit(0).select(col("vec_id"), col("embedding")),
      spark.range(1).select(lit(64L).as("vec_id")),
      col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(_.usedSidecar))
    assert(VectorIndex.loadCodes(spark, path)
      .filter(col("vec_id") === 64L).count() == 0,
      "the id updated during the bypass must be deletable via the sidecar — " +
        "bypassed writes must have maintained its (new) cell mapping")
    assertRebuildEquivalent(path, quant, postCorpus(Nil, Seq(64L)))
  }

  test("int-id index: sidecar entries are canonical long, routing still works (ADVICE r16)") {
    import org.apache.spark.sql.types.LongType
    // an index whose ids ARRIVE as int throughout — bucket hashes must not
    // depend on that arrival type (xxhash64(int) != xxhash64(long))
    val intCorpus = corpus.select(col("vec_id").cast("int").as("vec_id"),
      col("embedding"))
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_canon").toString
    val quant = VectorIndex.train(intCorpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(intCorpus, col("vec_id"), col("embedding"), quant), path)
    assert(spark.read.parquet(s"$path/idmap").schema("vec_id").dataType == LongType,
      "integral ids must be stored (and so hashed) as canonical long")
    // an int-typed change batch discovers through the sidecar
    val updInt = intCorpus.filter(col("vec_id") === 64)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updInt,
      intCorpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    val d = VectorIndex.lastUpsertDiscovery
    assert(d.exists(r => r.usedSidecar && r.bucketsRead <= 1),
      s"an int-typed batch must route through the canonical-long buckets: $d")
    assert(VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 16, topK = 5)
      .count() > 0)
  }

  test("pre-canonical (int-stored) sidecar is treated as absent, never silently probed") {
    val (path, quant) = freshIndex()
    // replace the sidecar with int-typed entries — the arrival-type debris a
    // pre-canonical writer could leave, whose bucket hashes a long probe
    // cannot reproduce (the ADVICE r16 silent-miss window)
    val legacy = VectorIndex.loadCodes(spark, path)
      .select(col("vec_id").cast("int").as("vec_id"), col("cell").cast("long").as("cell"))
      .withColumn("bucket", pmod(xxhash64(col("vec_id")), lit(VectorIndex.IdMapBuckets.toLong)))
    AnnFixturesAccess.rmDir(new java.io.File(s"$path/idmap"))
    legacy.write.mode("overwrite").partitionBy("bucket").parquet(s"$path/idmap")
    val updated = Seq(64L)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updatesFor(updated),
      corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(!_.usedSidecar),
      "a non-long integral sidecar must fall back to the full scan " +
        "(absence semantics), not probe buckets it cannot reproduce")
    assertRebuildEquivalent(path, quant, postCorpus(updated, Nil))
    // rebuildIdMap folds the legacy debris to canonical form
    VectorIndex.rebuildIdMap(spark, path)
    assert(spark.read.parquet(s"$path/idmap").schema("vec_id").dataType ==
      org.apache.spark.sql.types.LongType)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updatesFor(Seq(74L)),
      corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(_.usedSidecar))
    assertRebuildEquivalent(path, quant, postCorpus(updated ++ Seq(74L), Nil))
  }

  test("reindex rebuilds the sidecar for the promoted generation") {
    val (path, _) = freshIndex()
    VectorIndex.reindex(spark, path,
      corpus.select(col("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"), kCells = 16, iters = 1, pq = pq)
    assert(new java.io.File(s"$path/idmap").isDirectory,
      "reindex must rebuild the sidecar from the new generation's codes")
    // the rebuilt sidecar routes discovery and the new-generation index
    // still converges to rebuild-equivalence under ITS OWN quantizer
    val updated = Seq(114L)
    VectorIndex.lastUpsertDiscovery = None
    VectorIndex.upsertBatch(spark, path, updatesFor(updated),
      corpus.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
    assert(VectorIndex.lastUpsertDiscovery.exists(_.usedSidecar))
    val newQuant = VectorIndex.loadQuantizer(spark, path, pq)
    assertRebuildEquivalent(path,
      IvfadcQuantizer(newQuant.cents, newQuant.csubs, pq),
      postCorpus(updated, Nil))
  }
}

/** Tiny fs helper kept out of the test bodies. */
private object AnnFixturesAccess {
  def rmDir(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmDir))
    f.delete()
    ()
  }
}
