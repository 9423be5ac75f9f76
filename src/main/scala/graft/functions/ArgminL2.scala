package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Whole-stage-codegen nearest-centroid argmin: given a vector and an array
  * of candidate centroid vectors, returns the 0-based index of the centroid
  * with the smallest squared L2 distance; exact ties keep the FIRST (lowest
  * index). Per-centroid distances accumulate in double in sequential element
  * order — bit-identical to `VectorFunctions.l2sq` (and to the DuckDB oracle
  * duals' `list_sum(list_transform(...))`), so callers that sort the
  * centroid array by id get exactly the `ORDER BY dist ASC, id ASC` argmin.
  *
  * Why a custom Expression: nearest-centroid assignment runs once per corpus
  * row (× subspaces for PQ). The previous formulation exploded the corpus ×k
  * centroids and ranked with `row_number() OVER (PARTITION BY row)` — a full
  * shuffle + sort of n·k rows to answer a per-row question (the suite's
  * three slowest queries). With the centroids collapsed to one broadcast
  * array this expression makes assignment a map-only pass: zero exchanges
  * upstream of the candidate join. A higher-order `aggregate(transform(...))`
  * fold would be map-only too but evaluates interpreted per element;
  * this is the same preference rung as [[DotProduct]]/[[RhpSignature]].
  *
  * Null handling: null vector or null centroid-array yields null; an EMPTY
  * centroid array, a null centroid element, a length-mismatched centroid,
  * or a null ELEMENT inside the vector or any centroid also yield null (the
  * poisoned-sum semantics `l2sq` has on null/ragged input — there is no
  * meaningful argmin to return; reading a null slot as 0.0 would return a
  * confidently wrong index). Element checks are generated only when the
  * array type's containsNull says they can occur.
  */
final case class ArgminL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  // Nullable even when children aren't: empty/ragged centroid sets → null.
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def numeric(t: DataType) = t == FloatType || t == DoubleType
    (left.dataType, right.dataType) match {
      case (ArrayType(v, _), ArrayType(ArrayType(c, _), _)) if numeric(v) && numeric(c) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "argmin_l2 expects (array<float|double>, array<array<float|double>>), got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def centIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].elementType == FloatType
  private def vecMayHoldNull: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull
  private def centMayHoldNull: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cents = b.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val k = cents.numElements()
    if (k == 0) return null
    val vf = vecIsFloat
    val cf = centIsFloat
    var best = Double.PositiveInfinity
    var bestIdx = -1
    var j = 0
    while (j < k) {
      if (cents.isNullAt(j)) return null
      val c = cents.getArray(j)
      if (c.numElements() != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if ((vecMayHoldNull && vec.isNullAt(i)) || (centMayHoldNull && c.isNullAt(i)))
          return null
        val d = (if (vf) vec.getFloat(i).toDouble else vec.getDouble(i)) -
          (if (cf) c.getFloat(i).toDouble else c.getDouble(i))
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bestIdx = j }
      j += 1
    }
    if (bestIdx < 0) null else bestIdx
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getV = if (vecIsFloat) "getFloat" else "getDouble"
    val getC = if (centIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (vec, cents) => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val bad = ctx.freshName("bad")
      val nullElemCheck =
        if (vecMayHoldNull || centMayHoldNull) {
          val checks = Seq(
            if (vecMayHoldNull) Some(s"$vec.isNullAt($i)") else None,
            if (centMayHoldNull) Some(s"$c.isNullAt($i)") else None).flatten
          s"if (${checks.mkString(" || ")}) { $bad = true; break; }"
        } else ""
      s"""
         |final int $n = $vec.numElements();
         |final int $k = $cents.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |int $bestIdx = -1;
         |boolean $bad = false;
         |for (int $j = 0; $j < $k; $j++) {
         |  if ($cents.isNullAt($j)) { $bad = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $cents.getArray($j);
         |  if ($c.numElements() != $n) { $bad = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    double $d = (double) $vec.$getV($i) - (double) $c.$getC($i);
         |    $s += $d * $d;
         |  }
         |  if ($bad) break;
         |  if ($s < $best) { $best = $s; $bestIdx = $j; }
         |}
         |if ($bad || $bestIdx < 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $bestIdx;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgminL2 =
    copy(left = newLeft, right = newRight)
}
