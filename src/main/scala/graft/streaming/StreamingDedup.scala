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

  def nearDupCandidates(docs: Dataset[DocEvent], shingleWidth: Int = 3,
      nHashes: Int = 64, r: Int = 2, seed: Long = 42L,
      maxBucket: Int = 1000): Dataset[CandidatePair] = {
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
          val pairs = for {
            (id, i) <- admitted.zipWithIndex
            other <- prior.iterator ++ admitted.iterator.take(i)
          } yield CandidatePair(math.min(id, other), math.max(id, other))
          if (admitted.nonEmpty) state.update(BucketState(prior ++ admitted))
          pairs.distinct.iterator
      }
  }
}
