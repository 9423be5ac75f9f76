package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming near-duplicate detection: the MinHash+LSH candidate pipeline
  * (see [[graft.operators.Dedup]]) run CONTINUOUSLY — every arriving
  * document is checked against all previously-seen documents without ever
  * re-scanning the corpus.
  *
  * Shape: the stateless prefix (shingle-hash → MinHash signature → band
  * hashes) is the exact batch [[Dedup.bandTable]] pipeline applied to the
  * stream; the stateful suffix keys by (band_idx, band_hash) and keeps the
  * ids previously seen in each bucket as `flatMapGroupsWithState` state —
  * the streaming dual of the batch bucket-group. A new arrival emits one
  * candidate pair per prior occupant of any of its buckets.
  *
  * Semantics (matching the batch operator):
  *  - while no bucket exceeds `maxBucket`, the DISTINCT union of emitted
  *    pairs over all micro-batches equals [[Dedup.lshCandidates]] over the
  *    union of all batches (spec-asserted); pairs colliding in several
  *    bands are emitted at-least-once (the batch op's `distinct()` becomes
  *    downstream dedup — e.g. the exact-verify join is idempotent per pair);
  *  - `maxBucket` is the hot-bucket cap ([[Dedup.lshCandidates]]'s
  *    boilerplate hazard, which on an infinite stream is ALSO the state
  *    bound): once a bucket holds `maxBucket` ids, it stops accumulating
  *    and stops generating pairs — state per bucket is O(maxBucket), so
  *    total state is bounded by (buckets seen) × maxBucket regardless of
  *    stream length. When the cap BINDS the two operators intentionally
  *    diverge: a stream cannot retract, so it keeps the pairs among the
  *    first `maxBucket` admitted ids, whereas the batch op (which sees the
  *    final bucket width up front) skips the hot bucket entirely.
  */
object StreamingDedup {

  final case class DocEvent(doc_id: Long, text: String)
  final case class BucketState(ids: List[Long])
  final case class CandidatePair(id_a: Long, id_b: Long)

  /** @param capDrops no-silent-caps accounting for `maxBucket` (same
    *   policy as [[Dedup.CapObservation]] on the batch paths): when
    *   provided, every (bucket, id) occupancy the cap refuses is counted
    *   into the accumulator — readable on the driver after each batch and
    *   surfaced by the usual accumulator ops tooling. An accumulator
    *   (not an observe) because the drop is decided INSIDE the state
    *   function, where no column metric can see it; task retries can
    *   re-add, so treat it as an at-least-once ops signal, zero exactly
    *   when the cap never binds.
    */
  def nearDupCandidates(docs: Dataset[DocEvent], shingleWidth: Int = 3,
      nHashes: Int = 64, r: Int = 2, seed: Long = 42L,
      maxBucket: Int = 1000,
      capDrops: Option[org.apache.spark.util.LongAccumulator] = None): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val shingled = docs.toDF()
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), shingleWidth).as("__sh"))
    val banded = Dedup.bandTable(shingled, "doc_id", "__sh", nHashes, r, seed)
      .select(col("doc_id"), col("band_idx"), col("band_hash"))
      .as[(Long, Int, Int)]
    banded
      .groupByKey(row => (row._2, row._3))
      // NoTimeout: near-dup-against-all-history is the point; the state
      // bound comes from maxBucket, not from expiry. A windowed variant
      // (only dedup against the last N days) would use EventTimeTimeout.
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: (Int, Int), it: Iterator[(Long, Int, Int)], state: GroupState[BucketState]) =>
          val prior = state.getOption.map(_.ids).getOrElse(Nil)
          val priorSet = prior.toSet
          // arrival order within a batch is nondeterministic — sort so the
          // emitted pair set is a pure function of the bucket's members
          val fresh = it.map(_._1).toVector.distinct.sorted.filterNot(priorSet)
          // admit only up to the cap: admitted ids pair with all earlier
          // occupants; ids beyond the cap are dropped like the batch op
          // skips hot buckets (and they bound the state cell)
          val admitted = fresh.take(math.max(maxBucket - prior.size, 0))
          val overflow = fresh.size - admitted.size
          if (overflow > 0) capDrops.foreach(_.add(overflow.toLong))
          val pairs = for {
            (id, i) <- admitted.zipWithIndex
            other <- prior.iterator ++ admitted.iterator.take(i)
          } yield CandidatePair(math.min(id, other), math.max(id, other))
          if (admitted.nonEmpty) state.update(BucketState(prior ++ admitted))
          pairs.distinct.iterator
      }
  }

  /** Bounded-memory streaming EXACT dedup: emit each document the first
    * time its content fingerprint is seen, tracking history in per-group
    * Bloom bitmaps instead of an exact seen-set.
    *
    * Why not `dropDuplicates("fp")`? Its state store keeps EVERY distinct
    * key forever — on an unbounded stream that is unbounded state, and the
    * watermarked variant forgets history entirely past the horizon. This
    * operator's state is `nGroups` bitmaps × `mBits` bits, FIXED for the
    * stream's lifetime, in exchange for the Bloom trade: a false positive
    * drops a genuinely-new document (rate set by m/n per group); false
    * negatives — re-emitting a seen doc — are impossible. The same trade
    * CommonCrawl-scale URL dedup makes.
    *
    * Sharding: groups are keyed by `fp mod nGroups`, so a group's bitmap
    * only ever sees its own hash-slice — state scales horizontally with
    * executors and no bitmap needs to hold the whole stream. Within a
    * micro-batch, arrivals are sorted by (doc_id) before probing so the
    * emitted set is a pure function of the batch's contents, not of task
    * interleaving (first occurrence by id wins, as in [[Dedup]]'s
    * keep-first convention).
    */
  final case class SeenDoc(doc_id: Long, fp: Long)

  def bloomDedup(docs: Dataset[DocEvent], mBits: Int = 1 << 20,
      kHashes: Int = 4, nGroups: Int = 64): Dataset[SeenDoc] = {
    import docs.sparkSession.implicits._
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(kHashes > 0, "kHashes must be positive (k=0 would silently drop every doc)")
    require(nGroups > 0, "nGroups must be positive")
    docs.toDF()
      .select(col("doc_id"),
        graft.functions.TextFunctions.md5Hash60(col("text")).as("fp"))
      .as[SeenDoc]
      .groupByKey(d => java.lang.Long.remainderUnsigned(d.fp, nGroups))
      .flatMapGroupsWithState[Array[Long], SeenDoc](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[SeenDoc], state: GroupState[Array[Long]]) =>
          val bitmap = state.getOption.getOrElse(new Array[Long](mBits / 64))
          val pos = new Array[Int](kHashes)
          val out = List.newBuilder[SeenDoc]
          var changed = false
          it.toVector.sortBy(d => (d.doc_id, d.fp)).foreach { d =>
            graft.functions.Bloom.positions(d.fp, mBits, kHashes, pos)
            if (pos.exists(p => (bitmap(p >>> 6) & (1L << (p & 63))) == 0L)) {
              pos.foreach(p => bitmap(p >>> 6) |= 1L << (p & 63))
              changed = true
              out += d
            }
          }
          if (changed) state.update(bitmap)
          out.result().iterator
      }
  }

  /** The PERSISTED-INDEX streaming dual of [[Dedup.minHashIncremental]]: a
    * `foreachBatch` sink that grows the corpus band index per micro-batch
    * exactly as the batch operator computes it, and emits each batch's
    * near-dup pairs against everything indexed so far.
    *
    * Per micro-batch:
    *  1. shingle the fresh docs (the batch pipeline's exact prefix);
    *  2. read the persisted index — `indexDir/docs` (__id, __sh, __batch)
    *     and `indexDir/bands` (__id, band_idx, band_hash, __batch); an id
    *     re-ingested in a LATER batch supersedes (only its newest version
    *     pairs), resolved at read by keeping each id's max-__batch rows;
    *  3. pair fresh against the index + within the batch via
    *     [[Dedup.minHashIncrementalIndexed]] — the SAME code path the batch
    *     operator delegates to, so stream and batch cannot drift — and
    *     append the verified pairs to `indexDir/pairs` stamped with the
    *     batch id;
    *  4. append the fresh docs' shingle rows and band rows to the index.
    * The corpus is therefore banded exactly once, at the micro-batch where
    * each document arrived — never re-shingled, never re-banded, never
    * self-joined — and after N batches `indexDir/bands` equals the batch
    * [[Dedup.bandTable]] over the union of all batches (spec-asserted).
    *
    * Restart semantics: `foreachBatch` replays an in-flight batch on
    * recovery; the appends are stamped with `__batch`, so a replayed batch
    * is detected from the index (max __batch already >= current) and
    * skipped — the sink is idempotent per batch id.
    */
  def incrementalSink(indexDir: String, shingleWidth: Int = 3,
      threshold: Double = 0.5, nHashes: Int = 64, r: Int = 2, seed: Long = 42L,
      maxBucket: Int = Int.MaxValue): (Dataset[DocEvent], Long) => Unit = {
    (batch, batchId) =>
      val spark = batch.sparkSession
      val docsPath = s"$indexDir/docs"
      val bandsPath = s"$indexDir/bands"
      val pairsPath = s"$indexDir/pairs"
      val freshDocs = Dedup.spread(batch.toDF(), col("doc_id"))
        .select(col("doc_id").as("__id"),
          Dedup.shingleHashes(col("text"), shingleWidth).as("__sh"))
      val haveIndex = new java.io.File(docsPath).exists()
      val replayed = haveIndex && {
        val m = spark.read.parquet(docsPath)
          .agg(max(col("__batch"))).head().getLong(0)
        m >= batchId
      }
      if (!replayed) {
        val (corpusDocs, corpusBands) =
          if (!haveIndex)
            // first batch: empty index with the pipeline's own schemas
            (freshDocs.limit(0),
              Dedup.bandTable(freshDocs.limit(0), "__id", "__sh", nHashes, r, seed))
          else {
            val d0 = spark.read.parquet(docsPath)
            val latest = d0.groupBy(col("__id")).agg(max(col("__batch")).as("__batch"))
            (d0.join(latest, Seq("__id", "__batch"), "left_semi").drop("__batch"),
              spark.read.parquet(bandsPath)
                .join(latest, Seq("__id", "__batch"), "left_semi").drop("__batch"))
          }
        val pairs = Dedup.minHashIncrementalIndexed(
          corpusDocs, corpusBands, freshDocs, threshold, nHashes, r, seed, maxBucket)
        pairs.withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(pairsPath)
        freshDocs.withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(docsPath)
        Dedup.bandTable(freshDocs, "__id", "__sh", nHashes, r, seed)
          .withColumn("__batch", lit(batchId))
          .write.mode("append").parquet(bandsPath)
      }
  }
}
