package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Random-hyperplane LSH signature: `nBits` sign bits of hyperplane dot
  * products, packed into a long. The planes are derived deterministically
  * from `seed` (driver-side Gaussian draws) and ride into generated code as
  * ONE flat double[] reference.
  *
  * Why a custom Expression: the composed formulation — nBits ×
  * `when(DotProduct(vec, planeLiteral) >= 0, …)` summed — put 64 inlined
  * dot-product loops into one projection; the generated stage was large
  * enough that Janino compilation (~0.7 s, re-paid per query run) dominated
  * the actual work by 10×. One expression = one small loop nest, compiled
  * once, cache-friendly.
  */
object RhpSignature {
  /** The deterministic row-major nBits × dim plane matrix for (dim, nBits,
    * seed). Public so oracle-SQL generation can inline the SAME constants
    * and re-derive signatures bit-exactly in plain SQL
    * (`graft.queries.SimilarityQueries` embeds them as literal lists).
    */
  def planes(dim: Int, nBits: Int, seed: Long): Array[Double] = {
    val rnd = new java.util.Random(seed)
    Array.fill(nBits * dim)(rnd.nextGaussian())
  }
}

final case class RhpSignature(child: Expression, dim: Int, nBits: Int, seed: Long)
    extends UnaryExpression {

  require(nBits >= 1 && nBits <= 63, s"nBits must be in [1,63], got $nBits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rhp_signature expects array<float|double>, got ${other.catalogString}")
  }

  /** Row-major nBits × dim plane matrix; same draw order as a per-plane
    * `Array.fill(dim)(rnd.nextGaussian())` loop so signatures of
    * `dim`-length vectors are stable across refactors of the calling code.
    * (Vectors of a DIFFERENT length get a truncated-dot signature — the
    * original composed formulation's behavior; the corpus contract is
    * fixed-dim embeddings.)
    */
  @transient private lazy val planes: Array[Double] =
    RhpSignature.planes(dim, nBits, seed)

  @transient private lazy val childIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dim, vec.numElements())
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      val base = b * dim
      var i = 0
      while (i < n) {
        val v = if (childIsFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        acc += v * planes(base + i)
        i += 1
      }
      if (acc >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (childIsFloat) "getFloat" else "getDouble"
    val pRef = ctx.addReferenceObj("rhpPlanes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      val i = ctx.freshName("i")
      s"""
         |final int $n = java.lang.Math.min($dim, $in.numElements());
         |long $sig = 0L;
         |for (int $b = 0; $b < $nBits; $b++) {
         |  double $acc = 0.0;
         |  final int $base = $b * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $in.$get($i) * $pRef[$base + $i];
         |  }
         |  if ($acc >= 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RhpSignature =
    copy(child = newChild)
}
