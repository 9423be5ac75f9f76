package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Per-frame RMS energy of a binary payload interpreted as signed 8-bit
  * samples (PCM-ish): the waveform feature-extraction primitive for audio
  * columns. One generated-code pass over the bytes — `frameLen` samples per
  * frame, trailing partial frame included — because the alternative
  * (hex-string decomposition into an array, then higher-order folds) is
  * interpreted and allocates per byte, which a 100 TB audio pass cannot
  * afford. Same design family as [[ByteStride]].
  */
final case class FrameRms(child: Expression, frameLen: Int) extends UnaryExpression {

  require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frame_rms expects binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    // long arithmetic: `len + frameLen - 1` overflows Int for a huge
    // frameLen (user-callable via the registered SQL function)
    val nFrames = ((bytes.length.toLong + frameLen - 1) / frameLen).toInt
    val out = new Array[Double](nFrames)
    var f = 0
    while (f < nFrames) {
      val start = f * frameLen
      val end = math.min(start + frameLen, bytes.length)
      var sum = 0.0
      var i = start
      while (i < end) { val v = bytes(i).toDouble; sum += v * v; i += 1 }
      out(f) = math.sqrt(sum / (end - start))
      f += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val nFrames = ctx.freshName("nFrames")
      val out = ctx.freshName("out")
      val f = ctx.freshName("f")
      val start = ctx.freshName("start")
      val end = ctx.freshName("end")
      val sum = ctx.freshName("sum")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |final byte[] $bytes = $in;
         |final int $nFrames = (int) (((long) $bytes.length + $frameLen - 1) / $frameLen);
         |final double[] $out = new double[$nFrames];
         |for (int $f = 0; $f < $nFrames; $f++) {
         |  final int $start = $f * $frameLen;
         |  final int $end = java.lang.Math.min($start + $frameLen, $bytes.length);
         |  double $sum = 0.0;
         |  for (int $i = $start; $i < $end; $i++) {
         |    final double $v = (double) $bytes[$i];
         |    $sum += $v * $v;
         |  }
         |  $out[$f] = java.lang.Math.sqrt($sum / ($end - $start));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): FrameRms =
    copy(child = newChild)
}
