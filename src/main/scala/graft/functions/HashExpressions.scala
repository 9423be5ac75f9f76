package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen sketch expressions over a materialized `array<long>` of element
  * hashes. Both replace interpreted higher-order formulations that were the
  * bench's hottest operators: one pass over the hash array computes the
  * whole sketch in generated Java, instead of `nHashes` (resp. 64)
  * interpreted `aggregate`/`transform` folds per row.
  *
  * The affine permutation family (h*a+b over the full wrapping 64-bit ring,
  * the classic MinHash construction) is fine in JVM arithmetic — it was the
  * SQL-expression variant that tripped ANSI overflow checks.
  */
final case class MinHashSig(child: Expression, nHashes: Int, seed: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${other.catalogString}")
  }

  @transient private lazy val (coefA, coefB) = {
    val rnd = new java.util.Random(seed)
    (Array.fill(nHashes)(rnd.nextLong() | 1L), Array.fill(nHashes)(rnd.nextLong()))
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(nHashes)(Long.MaxValue)
    var j = 0
    while (j < arr.numElements()) {
      val h = arr.getLong(j)
      var i = 0
      while (i < nHashes) {
        val v = h * coefA(i) + coefB(i)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefA, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefB, "long[]")
    nullSafeCodeGen(ctx, ev, in => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $mins = new long[$nHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; $j < $in.numElements(); $j++) {
         |  final long $h = $in.getLong($j);
         |  for (int $i = 0; $i < $nHashes; $i++) {
         |    final long $v = $h * $aRef[$i] + $bRef[$i];
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash from token hashes: bit b of the result is set iff at least
  * half the tokens have bit b set (the sign of the ±1 sum). One pass, 64
  * popcount-style counters in generated code.
  */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) counts(b) += 1
        b += 1
      }
      j += 1
    }
    // empty input → 0L, not all-ones: the tie rule 2*count >= n holds
    // vacuously at n=0 and 0xFF..F would sit at small Hamming distance from
    // mostly-set real signatures, inviting spurious near-dup candidates
    if (n == 0) return 0L
    var sig = 0L
    var b = 0
    while (b < 64) {
      // 2*count - n >= 0  ⇔  sign bit set
      if (2 * counts(b) >= n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |final int $n = $in.numElements();
         |for (int $j = 0; $j < $n; $j++) {
         |  final long $h = $in.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) != 0L) $counts[$b]++;
         |  }
         |}
         |long $sig = 0L;
         |if ($n > 0) {
         |  for (int $b = 0; $b < 64; $b++) {
         |    if (2 * $counts[$b] >= $n) $sig |= (1L << $b);
         |  }
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
