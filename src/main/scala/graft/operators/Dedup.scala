package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines.
  *
  * Four tiers, in increasing tolerance to variation:
  *  1. exact        — hash-groupBy on content (one shuffle on a 128-bit hash);
  *  2. keyed        — keep-first by primary key (reference `PrimaryKey`,
  *                    schema.go:5-12, used for upsert-style dedup);
  *  3. MinHash LSH  — near-dup candidate generation in O(docs × bands)
  *                    instead of O(docs²), then exact-Jaccard verification
  *                    on candidates only;
  *  4. SimHash      — Hamming-ball near-dup via pigeonhole band join.
  *
  * Scale notes: nothing here is quadratic in corpus size. LSH candidate
  * generation shuffles (band_idx, band_hash) — at 100 TB the band tables are
  * a small multiple of the doc count, and the verify join touches only
  * bucket-colliding pairs. Skewed buckets (boilerplate docs) are the known
  * hazard: cap bucket width upstream or salt; AQE skew-join handles the rest.
  */
object Dedup {

  /** Exact dedup: one surviving row id per distinct content value.
    * Deterministic (min id wins), unlike dropDuplicates.
    */
  def exact(df: DataFrame, content: Column, id: Column): DataFrame =
    df.groupBy(md5(content.cast("binary")).as("content_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keyed keep-first: reference-style PrimaryKey dedup — the first row per
    * key under `order` survives with all its columns.
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Distinct word w-gram shingles of a text column (the unit of Jaccard).
    * Guarded for short docs: Spark's sequence(1, 0) would generate a
    * DESCENDING [1, 0] rather than an empty array.
    */
  def shingles(text: Column, w: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(
          sequence(lit(1), size(toks) - lit(w - 1)),
          i => concat_ws(" ", slice(toks, i, lit(w))))))
  }

  /** MinHash signature of a shingle array: `nHashes` independent hash
    * functions realized as xxhash64 re-hashes of a per-shingle base hash,
    * keyed by (seed, permutation index) — min per function. Pure built-ins,
    * stays in codegen, and overflow-free under ANSI mode (an affine h*a+b
    * family would throw ARITHMETIC_OVERFLOW on Spark 4's default ANSI).
    * Re-hashing a long is far cheaper than re-hashing the shingle string.
    */
  def minHashSignature(shingleCol: Column, nHashes: Int, seed: Long): Column = {
    val baseHashes = transform(shingleCol, s => xxhash64(s))
    array((0 until nHashes).map { i =>
      array_min(transform(baseHashes, h => xxhash64(lit(seed), lit(i), h)))
    }: _*)
  }

  /** LSH candidate pairs: docs sharing at least one (band index, band hash)
    * bucket. `r` = rows per band; bands = nHashes / r. With nHashes=64, r=2
    * (32 bands), recall at Jaccard 0.8 is 1-(1-0.8^2)^32 ≈ 1-4e-15 —
    * effectively exhaustive above the threshold while pruning the low-J mass.
    *
    * @param docs (id, shingles) — id column named `idCol`, shingle array
    *             named `shingleCol`
    * @return (id_a, id_b) candidate pairs, id_a < id_b, distinct
    */
  def lshCandidates(
      docs: DataFrame, idCol: String, shingleCol: String,
      nHashes: Int, r: Int, seed: Long): DataFrame = {
    val nBands = nHashes / r
    // Materialize the per-shingle base hashes in their own projection: the
    // band-hash tree below references them 64×, which blocks CollapseProject
    // from re-inlining the string hashing (a fused single-projection version
    // re-hashed every shingle per permutation × per band — 2048× the work).
    // Each band hash is then built directly over its r min-hashes, so every
    // min-hash expression occurs exactly once in the plan.
    val hashed = docs
      .filter(size(col(shingleCol)) > 0)
      .select(col(idCol), transform(col(shingleCol), s => xxhash64(s)).as("__bh"))
    val bandHashes = array((0 until nBands).map { b =>
      hash((b * r until (b + 1) * r).map { i =>
        array_min(transform(col("__bh"), h => xxhash64(lit(seed), lit(i), h)))
      }: _*)
    }: _*)
    val banded = hashed
      .select(col(idCol), posexplode(bandHashes).as(Seq("band_idx", "band_hash")))
    val a = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_a"))
    val b = banded.select(col("band_idx"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
  }

  /** Exact Jaccard over given pairs: joins the shingle sets back and computes
    * |∩| / |∪| with array built-ins (per-pair, no explode).
    */
  def verifyJaccard(
      pairs: DataFrame, docs: DataFrame, idCol: String, shingleCol: String): DataFrame = {
    val da = docs.select(col(idCol).as("id_a"), col(shingleCol).as("__sh_a"))
    val db = docs.select(col(idCol).as("id_b"), col(shingleCol).as("__sh_b"))
    pairs.join(da, "id_a").join(db, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("__sh_a"), col("__sh_b"))).cast("double") /
          size(array_union(col("__sh_a"), col("__sh_b"))))
      .drop("__sh_a", "__sh_b")
  }

  /** Full MinHash+LSH near-dup pipeline: candidates → exact verification →
    * pairs with Jaccard >= threshold.
    */
  def minHashDuplicates(
      df: DataFrame, id: Column, text: Column, shingleWidth: Int,
      threshold: Double, nHashes: Int = 64, r: Int = 2, seed: Long = 42L): DataFrame = {
    val docs = df.select(id.as("__id"), shingles(text, shingleWidth).as("__sh"))
    val cands = lshCandidates(docs, "__id", "__sh", nHashes, r, seed)
    verifyJaccard(cands, docs, "__id", "__sh")
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over a column of precomputed token hashes: bit b of the
    * result is the sign of Σ_tokens (bit b of hash ? +1 : -1). Callers must
    * pass a *materialized* hash-array column (not an inline `transform`) —
    * the 64 per-bit folds below each reference it, and an inline expression
    * would be re-evaluated 64×.
    */
  def simHash64(tokenHashes: Column): Column =
    (0 until 64).map { b =>
      val bitSum = aggregate(tokenHashes, lit(0),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << b)) =!= 0L, 1).otherwise(-1))
      when(bitSum >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Token hashes of a whitespace-tokenized text column (SimHash input). */
  def tokenHashes(text: Column): Column =
    transform(split(text, " "), tok => xxhash64(tok))

  /** SimHash near-dup pairs with Hamming distance <= maxDist, found via the
    * pigeonhole band join: split the 64-bit hash into maxDist+1 bands — any
    * pair within distance maxDist agrees exactly on >= 1 band.
    */
  def simHashDuplicates(df: DataFrame, id: Column, text: Column, maxDist: Int): DataFrame = {
    val nBands = maxDist + 1
    val width = 64 / nBands
    val sigs = df
      .select(id.as("__id"), tokenHashes(text).as("__th"))
      .select(col("__id"), simHash64(col("__th")).as("__sig"))
    val banded = sigs.select(col("__id"), col("__sig"), posexplode(
      array((0 until nBands).map { b =>
        shiftright(col("__sig"), b * width).bitwiseAND(lit((1L << width) - 1))
      }: _*)).as(Seq("band_idx", "band_val")))
    val a = banded.select(col("band_idx"), col("band_val"), col("__id").as("id_a"), col("__sig").as("__sig_a"))
    val b = banded.select(col("band_idx"), col("band_val"), col("__id").as("id_b"), col("__sig").as("__sig_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__sig_a").bitwiseXOR(col("__sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }
}
