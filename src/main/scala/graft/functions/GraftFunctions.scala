package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's custom codegen expressions, so
  * `spark.sql(...)` users get the same operators as the Column API:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT dot_product(a, b), simhash64(hashes) FROM t")
  * }}}
  */
object GraftFunctions {

  private def fn(name: String, usage: String, builder: Seq[Expression] => Expression) =
    // 5-arg constructor (className, db, name, usage, extended): the 3-arg
    // overload is (className, db, NAME) — passing usage there made
    // DESCRIBE FUNCTION report the usage sentence as the function's name
    (FunctionIdentifier(name), new ExpressionInfo("graft.functions", null, name, usage, ""), builder)

  private val fns = Seq(
    fn("dot_product", "dot_product(a, b) - double-precision dot product of two float/double arrays",
      exprs => DotProduct(exprs(0), exprs(1))),
    fn("minhash_sig", "minhash_sig(hashes, nHashes, seed) - MinHash signature of an array<bigint>",
      exprs => MinHashSig(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].longValue())),
    fn("simhash64", "simhash64(hashes) - 64-bit SimHash of an array<bigint>",
      exprs => SimHash64(exprs(0))),
    fn("byte_stride", "byte_stride(bin, k) - every k-th byte of a binary",
      exprs => ByteStride(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())),
    fn("byte_resample", "byte_resample(bin, n) - nearest-neighbor resample of a binary to exactly n bytes (empty stays empty)",
      exprs => ByteResample(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())),
    fn("rhp_signature", "rhp_signature(vec, dim, nBits, seed) - random-hyperplane LSH signature of a float/double array",
      exprs => RhpSignature(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].longValue())),
    fn("shingle_hashes", "shingle_hashes(text, w) - xxhash64 of each w-token window of a string",
      exprs => ShingleHashes(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())),
    fn("frame_rms", "frame_rms(bin, frameLen) - per-frame RMS of a binary as signed 8-bit samples",
      exprs => FrameRms(exprs(0), exprs(1).eval().asInstanceOf[Number].intValue())),
    fn("argmin_l2", "argmin_l2(vec, centroids) - 0-based index of the nearest centroid by squared L2; first wins ties",
      exprs => ArgminL2(exprs(0), exprs(1))),
    fn("bloom_bitmap", "bloom_bitmap(hash, m, k) - aggregate: OR the k Bloom bit positions of each bigint hash into an m-bit array<bigint> bitmap",
      exprs => BloomBitmapAgg(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()).toAggregateExpression()),
    fn("bloom_contains", "bloom_contains(hash, bitmap, m, k) - true iff all k Bloom positions of hash are set in the array<bigint> bitmap",
      exprs => BloomContains(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Number].intValue(),
        exprs(3).eval().asInstanceOf[Number].intValue())),
    fn("token_run_count", "token_run_count(text) - count of [a-z]+|[0-9]+|[^a-z0-9 ] tokenizer matches in one byte scan (no regex, no match array)",
      exprs => TokenRunCount(exprs(0))))

  def register(spark: SparkSession): Unit =
    fns.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
