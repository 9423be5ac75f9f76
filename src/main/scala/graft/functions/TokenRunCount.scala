package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of BPE-ish tokenizer matches of `[a-z]+|[0-9]+|[^a-z0-9 ]` — the
  * `text_bpe_count` semantics — computed in ONE byte scan with no regex
  * engine and no materialized match array.
  *
  * `size(regexp_extract_all(text, ...))` allocates every match as a string
  * into an array only to take its length; at 100 TB the token counter is a
  * pure map over text bytes and the allocation IS the cost. The scan
  * counts maximal `[a-z]` runs, maximal `[0-9]` runs, and one match per
  * remaining non-space CODE POINT (UTF-8 lead bytes advance by the
  * encoded length, so a multi-byte character counts once — exactly one
  * regex match per code point, the Java-regex and RE2 semantics; the
  * oracle keeps the regex formulation, so the equivalence is
  * hash-checked, and TokenRunCountSpec pins it property-wise over
  * random Unicode).
  */
final case class TokenRunCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_run_count expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    TokenRunCount.count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.TokenRunCount.count($in);")

  override protected def withNewChildInternal(newChild: Expression): TokenRunCount =
    copy(child = newChild)
}

object TokenRunCount {
  /** One pass over the UTF-8 bytes. Run classes: 1 = [a-z], 2 = [0-9];
    * space resets; any other byte sequence starting a code point counts 1
    * and advances by the UTF-8 length of that code point.
    */
  def count(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var cls = 0
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        if (cls != 1) cnt += 1
        cls = 1; i += 1
      } else if (b >= '0' && b <= '9') {
        if (cls != 2) cnt += 1
        cls = 2; i += 1
      } else if (b == ' ') {
        cls = 0; i += 1
      } else {
        cnt += 1
        cls = 0
        // advance one CODE POINT: ASCII or a UTF-8 lead byte's length
        // (continuation bytes can't start a char in valid UTF-8; advance 1
        // defensively if one does)
        val ub = b & 0xFF
        i += (if (ub < 0x80) 1
              else if ((ub & 0xE0) == 0xC0) 2
              else if ((ub & 0xF0) == 0xE0) 3
              else if ((ub & 0xF8) == 0xF0) 4
              else 1)
      }
    }
    cnt
  }
}
