package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** [[TextFunctions.md5Hash60]] of every `w`-token window of a
  * space-tokenized string, hashed directly over the original byte range in
  * one codegen pass — the md5 dual of [[ShingleHashes]] for the
  * oracle-re-derivable pipelines (hashing-trick TF, rolling fingerprints)
  * whose per-window `conv(substring(md5(...)))` lambda was the interpreted
  * floor of the map-only bench (~2 s combined at sf0.1; this: ~0.2 s).
  *
  * Equivalent to `transform(ngrams(split(text, " "), w), g -> md5Hash60(g))`
  * (tokens are contiguous in the source, so a window's byte range IS the
  * `concat_ws(" ")` string) — INCLUDING split semantics on empty input:
  * `split("") = [""]`, one empty token, so w=1 yields `[md5Hash60("")]`
  * (unlike [[ShingleHashes]], whose set-semantics guard maps empty input
  * to an empty array). The 60-bit value is the integer of the first 15 hex
  * chars of the md5 digest: bytes 0–6 in full plus the high nibble of
  * byte 7 — positive in a signed 64-bit lane on any engine.
  */
final case class Md5ShingleHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_shingle_hashes expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5ShingleHashes.compute(input.asInstanceOf[UTF8String], w))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.Md5ShingleHashes.compute($in, $w));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Md5ShingleHashes =
    copy(child = newChild)
}

object Md5ShingleHashes {

  // MessageDigest is stateful; one instance per thread, reset per use
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Shared kernel for interpreted and generated code paths. */
  def compute(s: UTF8String, w: Int): Array[Long] = {
    val bytes = s.getBytes
    val n = bytes.length
    var ntok = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') ntok += 1; i += 1 }
    val nw = ntok - w + 1
    if (nw <= 0) return Array.emptyLongArray
    val starts = new Array[Int](ntok + 1)
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(ntok) = n + 1 // sentinel: end(j) = starts(j+1) - 1
    val digest = md5.get()
    val out = new Array[Long](nw)
    i = 0
    while (i < nw) {
      digest.reset()
      digest.update(bytes, starts(i), starts(i + w) - 1 - starts(i))
      val d = digest.digest()
      // first 15 hex chars = bytes 0-6 in full + high nibble of byte 7
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = (v << 4) | ((d(7) & 0xf0L) >>> 4)
      i += 1
    }
    out
  }
}
