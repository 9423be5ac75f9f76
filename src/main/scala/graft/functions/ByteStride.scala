package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Every k-th byte of a binary payload — the stride access pattern of frame
  * sampling over opaque media blobs. A Catalyst expression because Spark has
  * no binary↔array bridge and higher-order functions don't apply to
  * `binary`; generated code is a tight primitive loop.
  */
final case class ByteStride(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "stride must be positive")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_stride expects binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[Array[Byte]]
    // long arithmetic: `len + k - 1` overflows Int for a huge user-supplied k
    val out = new Array[Byte](((in.length.toLong + k - 1) / k).toInt)
    var i = 0
    while (i < out.length) { out(i) = in(i * k); i += 1 }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |byte[] $out = new byte[(int) (((long) $in.length + ${k - 1}L) / $k)];
         |for (int $i = 0; $i < $out.length; $i++) { $out[$i] = $in[$i * $k]; }
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteStride =
    copy(child = newChild)
}
