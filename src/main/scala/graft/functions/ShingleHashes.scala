package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** xxhash64 of every `w`-token shingle of a space-tokenized string, hashed
  * directly over the original byte range — one pass, zero intermediate
  * strings.
  *
  * Equivalent to `transform(shingles(text, w), s -> xxhash64(s))` (tokens
  * are contiguous in the source, so the byte range of a window IS the
  * concat_ws(" ") string), but the interpreted higher-order formulation
  * allocates every shingle string and was the #1 cost of the MinHash
  * pipeline; this is a codegen byte scan. Seed 42 matches Spark's xxhash64.
  *
  * Hash-space note: downstream Jaccard over hashed shingles equals
  * string-shingle Jaccard up to 64-bit collisions (~n²/2⁶⁵ per doc pair) —
  * the standard trade for dedup at scale.
  */
final case class ShingleHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    // token starts: 0, and i+1 for every space
    var ntok = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') ntok += 1; i += 1 }
    val starts = new Array[Int](ntok + 1)
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(ntok) = n + 1 // sentinel: end(j) = starts(j+1) - 1
    val nw = ntok - w + 1
    if (n == 0 || nw <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](nw)
      i = 0
      while (i < nw) {
        val from = starts(i)
        val until = starts(i + w) - 1
        out(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from, until - from, 42L)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val ntok = ctx.freshName("ntok")
      val starts = ctx.freshName("starts")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val nw = ctx.freshName("nw")
      val out = ctx.freshName("out")
      val from = ctx.freshName("from")
      val until = ctx.freshName("until")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |final int $n = $bytes.length;
         |int $ntok = 1;
         |for (int $i = 0; $i < $n; $i++) { if ($bytes[$i] == ' ') $ntok++; }
         |final int[] $starts = new int[$ntok + 1];
         |int $t = 1;
         |for (int $i = 0; $i < $n; $i++) { if ($bytes[$i] == ' ') { $starts[$t] = $i + 1; $t++; } }
         |$starts[$ntok] = $n + 1;
         |final int $nw = $ntok - $w + 1;
         |if ($n == 0 || $nw <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  final long[] $out = new long[$nw];
         |  for (int $i = 0; $i < $nw; $i++) {
         |    final int $from = $starts[$i];
         |    final int $until = $starts[$i + $w] - 1;
         |    $out[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + $from, $until - $from, 42L);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
