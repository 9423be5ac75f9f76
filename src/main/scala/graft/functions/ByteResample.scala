package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Nearest-neighbor resample of a binary payload to a FIXED length `n` —
  * the 1-D form of resize: out[i] = in[floor(i * len / n)]. Variable-length
  * media become fixed-shape feature vectors in one codegen pass (the
  * "resize before featurize" preprocessing step; [[ByteStride]] is the
  * keep-every-kth dual for when output length should scale with input).
  * Empty payloads resample to empty — there is no byte to repeat.
  *
  * Index math in long: `i * len` overflows Int at ~2 GB payloads times
  * n > 1; the floor division then picks the same byte DuckDB's
  * `(i * len) // n` does, which is what makes the gate's hex-decomposition
  * oracle exact.
  */
final case class ByteResample(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "target length must be positive")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"byte_resample expects binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[Array[Byte]]
    if (in.length == 0) Array.emptyByteArray
    else {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) { out(i) = in(((i.toLong * in.length) / n).toInt); i += 1 }
      out
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |byte[] $out;
         |if ($in.length == 0) { $out = new byte[0]; }
         |else {
         |  $out = new byte[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = $in[(int) (((long) $i * $in.length) / $n)];
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteResample =
    copy(child = newChild)
}
