package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType` embedding columns using higher-order
  * built-ins (`zip_with`, `aggregate`, `transform`) — no UDFs, no driver
  * round-trips, so the same expressions run unchanged over 100 TB of
  * embedding shards.
  *
  * All arithmetic is double-precision: inputs are cast element-wise before
  * multiplication so results are bit-comparable with an oracle computing in
  * doubles (float32 accumulation would drift).
  */
object VectorFunctions {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential-order dot product (matches a naive loop's rounding).
    * Codegen Catalyst expression — the higher-order
    * `aggregate(zip_with(...))` formulation evaluates interpreted and is
    * ~100× slower in pairwise similarity joins; identical results.
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      DotProduct(
        org.apache.spark.sql.graftshim.Bridge.childExpr(a),
        org.apache.spark.sql.graftshim.Bridge.childExpr(b)))

  /** Interpreted higher-order dual of [[dot]] (kept for cross-checking the
    * codegen expression in tests).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH signature: `nBits` sign bits packed into a long.
    * Hyperplanes are generated driver-side from a fixed seed and ride into
    * generated code as one flat reference array — deterministic across runs
    * and executors, broadcast-free. Single codegen expression
    * ([[RhpSignature]]): the composed when(dot(...)) formulation generated
    * Janino-compile-dominated stages.
    */
  def rhpSignature(vec: Column, dim: Int, nBits: Int, seed: Long): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      RhpSignature(org.apache.spark.sql.graftshim.Bridge.childExpr(vec), dim, nBits, seed))

  /** Popcount of the XOR — Hamming distance between two packed signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 0-based index of the nearest centroid (squared L2, first-wins on exact
    * ties) in an array-of-vectors column. Codegen ([[ArgminL2]]) — makes
    * nearest-centroid assignment a map-only pass over a broadcast centroid
    * array instead of an explode + window shuffle of n×k rows.
    */
  def argminL2(vec: Column, cents: Column): Column =
    org.apache.spark.sql.graftshim.Bridge.column(
      ArgminL2(
        org.apache.spark.sql.graftshim.Bridge.childExpr(vec),
        org.apache.spark.sql.graftshim.Bridge.childExpr(cents)))
}
