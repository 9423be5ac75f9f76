package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** 60-bit difference-hash of a binary payload in ONE codegen byte pass —
  * the perceptual media fingerprint ([[graft.operators.Multimodal.pHash60]]
  * is the SQL-re-derivable built-ins formulation; this expression computes
  * the identical value: sample 61 bytes at positions floor(i·len/61), bit i
  * = sample i < sample i+1, empty payload → 0). The built-ins tree
  * references its hex-encoded input ~120 times (measured ~3.5 s over 5 000
  * docs at sf0.1 even with the hex staged); this is a direct unsigned-byte
  * comparison over the raw payload (~0.1 s). The double product i·len/61
  * stays far below 2^53, so the floor is exact — matching the SQL dual on
  * any engine.
  */
final case class DHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dhash60 expects binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DHash60.compute(input.asInstanceOf[Array[Byte]])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.DHash60.compute($in);")

  override protected def withNewChildInternal(newChild: Expression): DHash60 =
    copy(child = newChild)
}

object DHash60 {

  /** Shared kernel for interpreted and generated code paths. */
  def compute(bytes: Array[Byte]): Long = {
    val m = bytes.length
    if (m == 0) return 0L
    var sig = 0L
    var prev = bytes(0) & 0xff // position floor(0·m/61) = 0
    var i = 1
    while (i <= 60) {
      val next = bytes(math.floor(i.toDouble * m / 61.0).toInt) & 0xff
      if (prev < next) sig |= 1L << (i - 1)
      prev = next
      i += 1
    }
    sig
  }
}
