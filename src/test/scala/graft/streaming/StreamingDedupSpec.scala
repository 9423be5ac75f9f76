package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.StreamingDedup.DocEvent

/** Streaming near-dup candidates == batch LSH candidates over the same
  * corpus, including pairs that SPAN micro-batches (the whole point: a new
  * arrival is checked against state, not against a re-scanned corpus).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    DocEvent(1L, "the quick brown fox jumps over the lazy dog today"),
    DocEvent(2L, "the quick brown fox jumps over the lazy dog tonight"),
    DocEvent(3L, "completely different text about spark engines and scala"),
    DocEvent(4L, "the quick brown fox jumps over the lazy dog today"))

  private def batchCandidates(corpus: Seq[DocEvent], maxBucket: Int = 1000): Set[(Long, Long)] = {
    val df = corpus.toDF()
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("__sh"))
    Dedup.lshCandidates(df, "doc_id", "__sh", nHashes = 64, r = 2, seed = 42L,
      maxBucket = maxBucket)
      .as[(Long, Long)].collect().toSet
  }

  test("stream candidates (distinct) == batch lshCandidates; cross-batch pairs found") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = StreamingDedup.nearDupCandidates(in.toDS())
      .writeStream.format("memory").queryName("neardup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(docs.take(2)); q.processAllAvailable()
      val afterB1 = spark.table("neardup").as[(Long, Long)].collect().toSet
      in.addData(docs.drop(2)); q.processAllAvailable()
      val streamed = spark.table("neardup").as[(Long, Long)].collect().toSet
      val batch = batchCandidates(docs)
      assert(streamed == batch)
      // (1,4) spans the two micro-batches: doc 4 arrived after doc 1's
      // buckets were already state — it can only come from state lookups
      assert((streamed -- afterB1).contains((1L, 4L)))
      assert(!streamed.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc clean
    } finally q.stop()
  }

  test("maxBucket caps state and pair generation (boilerplate flood)") {
    implicit val sc = spark.sqlContext
    // five identical docs: every band bucket fills with all five ids
    val flood = (1L to 5L).map(i => DocEvent(i, "same boilerplate text repeated here always"))
    val in = MemoryStream[DocEvent]
    val dropped = spark.sparkContext.longAccumulator("lsh_cap_dropped")
    val q = StreamingDedup.nearDupCandidates(in.toDS(), maxBucket = 2, capDrops = Some(dropped))
      .writeStream.format("memory").queryName("neardup_cap")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(flood.take(3)); q.processAllAvailable()
      in.addData(flood.drop(3)); q.processAllAvailable()
      val pairs = spark.table("neardup_cap").as[(Long, Long)].collect().toSet
      // only the first 2 admitted ids per bucket pair up: exactly (1,2)
      assert(pairs == Set((1L, 2L)))
      // no silent caps, streaming side: 1 refused occupancy in batch 1 and
      // 2 in batch 2 per bucket, over the 32 identical-doc band buckets
      assert(dropped.value == 3L * 32,
        s"cap must account every refused (bucket, id) occupancy, got ${dropped.value}")
    } finally q.stop()
  }

  test("cap accounting stays zero when the cap never binds") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val dropped = spark.sparkContext.longAccumulator("lsh_cap_dropped_quiet")
    val q = StreamingDedup.nearDupCandidates(in.toDS(), maxBucket = 100, capDrops = Some(dropped))
      .writeStream.format("memory").queryName("neardup_cap_quiet")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(docs); q.processAllAvailable()
      assert(dropped.value == 0L, "an unbinding cap must report zero drops")
    } finally q.stop()
  }

  test("incrementalSink: persisted band index and pairs over 3 micro-batches == batch operator") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("inc_sink").toString
    // real fixture docs, 3 batches of 30 — near-dups in the synthetic
    // corpus span batches
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[DocEvent].collect().sortBy(_.doc_id).take(90)
    val batches = fixture.grouped(30).toSeq
    assert(batches.size == 3)
    val in = MemoryStream[DocEvent]
    val q = in.toDS().writeStream
      .foreachBatch(StreamingDedup.incrementalSink(dir, shingleWidth = 3, threshold = 0.5))
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
    } finally q.stop()

    // 1. the persisted index grew exactly as the batch operator computes it
    val all = fixture.toSeq.toDF()
    val allSh = all.select(col("doc_id").as("__id"),
      Dedup.shingleHashes(col("text"), 3).as("__sh"))
    val batchBands = Dedup.bandTable(allSh, "__id", "__sh", 64, 2, 42L)
      .select(col("__id"), col("band_idx"), col("band_hash"))
      .as[(Long, Int, Int)].collect().sorted.toSeq
    val streamBands = spark.read.parquet(s"$dir/bands")
      .select(col("__id"), col("band_idx"), col("band_hash"))
      .as[(Long, Int, Int)].collect().sorted.toSeq
    assert(streamBands == batchBands,
      "persisted band index must equal the batch bandTable over the union of batches")
    // docs indexed once each, stamped with their arrival batch
    val perBatch = spark.read.parquet(s"$dir/docs").groupBy(col("__batch"))
      .agg(org.apache.spark.sql.functions.count(col("__id")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(perBatch == Map(0L -> 30L, 1L -> 30L, 2L -> 30L))

    // 2. union of per-batch pair emissions == the full-corpus batch operator
    // (every pair touches some batch: emitted exactly when its later
    // endpoint arrived)
    val batchPairs = Dedup.minHashDuplicates(all, col("doc_id"), col("text"), 3, 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val streamPairs = spark.read.parquet(s"$dir/pairs")
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(streamPairs == batchPairs,
      s"streamed pair union (${streamPairs.size}) != batch operator (${batchPairs.size})")
    assert(batchPairs.nonEmpty, "fixture should contain near-dups for the parity to be meaningful")
  }

  test("bloomDedup: first occurrence kept, exact repeats dropped across batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[DocEvent]
    // 2^20-bit filter, handful of docs: FP probability is ~0, so the output
    // must be EXACTLY keep-first semantics on this fixture
    val q = StreamingDedup.bloomDedup(in.toDS())
      .writeStream.format("memory").queryName("bloomdedup")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(docs.take(3)); q.processAllAvailable()
      val b1 = spark.table("bloomdedup").as[(Long, Long)].collect().map(_._1).toSet
      assert(b1 == Set(1L, 2L, 3L)) // three distinct texts all admitted
      // doc 4 repeats doc 1's text EXACTLY — its fingerprint is state now,
      // so a later batch must drop it; doc 5 is new and must pass
      in.addData(docs.drop(3) :+ DocEvent(5L, "yet another brand new document body"))
      q.processAllAvailable()
      val all = spark.table("bloomdedup").as[(Long, Long)].collect().map(_._1).toSet
      assert(all == Set(1L, 2L, 3L, 5L), s"got $all")
    } finally q.stop()
  }

  test("bloomDedup: within-batch repeats collapse to the lowest doc_id") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[DocEvent]
    val q = StreamingDedup.bloomDedup(in.toDS())
      .writeStream.format("memory").queryName("bloomdedup2")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append()).start()
    try {
      in.addData(Seq(DocEvent(9L, "dup body"), DocEvent(7L, "dup body"), DocEvent(8L, "other")))
      q.processAllAvailable()
      val ids = spark.table("bloomdedup2").as[(Long, Long)].collect().map(_._1).toSet
      assert(ids == Set(7L, 8L), s"keep-first by id should admit 7 not 9: $ids")
    } finally q.stop()
  }
}
