package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair encoding to token IDS (not just a count — the r10 gap): base
  * tokens are Unicode code points, then the merge table is applied in rank
  * order, each rank one greedy left-to-right pass replacing adjacent
  * `(left, right)` with `merged` — the standard BPE apply loop (the
  * training side of BPE picks the table; a data pipeline ships a frozen
  * table and only ever runs this apply loop, exactly like the frozen
  * IVFADC quantizer ships with the vector index).
  *
  * The FIXED toy table below keeps every rank's `left != right`. That
  * constraint is load-bearing for the ORACLE: when left != right, two
  * occurrences of the pair can never overlap (an occurrence's right
  * element can't start another occurrence), so one rank's greedy pass
  * equals a SIMULTANEOUS replacement — which is expressible as a pure
  * per-element list expression in SQL ([[duckdbCtes]]) and re-derivable by
  * DuckDB without loops. BpeSpec pins greedy == simultaneous property-wise
  * over adversarial strings, so the oracle equivalence rests on a tested
  * law, not an assumption.
  */
object Bpe {

  /** (left, right, merged) in rank order; merged ids start at 256 and may
    * appear as the left/right of later ranks (the "and" chain exercises
    * exactly that).
    */
  val Merges: Seq[(Int, Int, Int)] = Seq(
    ('t'.toInt, 'h'.toInt, 256), // t h  -> th
    (256, 'e'.toInt, 257),       // th e -> the
    ('i'.toInt, 'n'.toInt, 258), // i n  -> in
    ('a'.toInt, 'n'.toInt, 259), // a n  -> an
    (259, 'd'.toInt, 260),       // an d -> and
    ('e'.toInt, 'r'.toInt, 261), // e r  -> er
    ('o'.toInt, 'n'.toInt, 262), // o n  -> on
    ('r'.toInt, 'e'.toInt, 263)) // r e  -> re
  require(Merges.forall { case (a, b, _) => a != b },
    "left == right would make one pass order-dependent (overlapping " +
      "occurrences) and break the SQL simultaneous-replacement oracle")
  require(Merges.map(_._3).distinct.size == Merges.size, "merged ids must be unique")

  /** The greedy apply loop over code points — one left-to-right pass per
    * rank, merged elements skip their right partner. Shared by the codegen
    * expression and any driver-side caller.
    */
  def encode(text: String, merges: Seq[(Int, Int, Int)] = Merges): Array[Int] = {
    var toks = text.codePoints().toArray
    merges.foreach { case (a, b, c) =>
      val out = new Array[Int](toks.length)
      var i = 0
      var n = 0
      while (i < toks.length) {
        if (toks(i) == a && i + 1 < toks.length && toks(i + 1) == b) {
          out(n) = c; n += 1; i += 2
        } else {
          out(n) = toks(i); n += 1; i += 1
        }
      }
      toks = java.util.Arrays.copyOf(out, n)
    }
    toks
  }

  def encodeUtf8(s: UTF8String): ArrayData =
    new GenericArrayData(encode(s.toString))

  /** DuckDB CTE chain re-deriving the encode for the oracle: `bpe0` splits
    * `textCol` into code points, then one CTE per rank applies the
    * simultaneous replacement (exact because left != right — see the
    * object doc): position i becomes `merged` when (l[i], l[i+1]) is the
    * pair, is dropped when it was consumed as a right element
    * (l[i-1], l[i]), and passes through otherwise. Out-of-range list
    * indexes (l[0], l[len+1]) are NULL in DuckDB, so the boundary
    * conditions fall out of three-valued logic. The final CTE is
    * `bpe${Merges.size}` with columns (doc_id, l).
    */
  def duckdbCtes(src: String = "documents", textCol: String = "text"): String = {
    val s0 =
      s"""bpe0 AS (SELECT doc_id,
         list_transform(range(1, length($textCol) + 1), i -> unicode($textCol[i])) AS l
         FROM $src)"""
    val steps = Merges.zipWithIndex.map { case ((a, b, c), k) =>
      s"""bpe${k + 1} AS (SELECT doc_id, list_filter(list_transform(range(1, len(l) + 1), i ->
         CASE WHEN l[i] = $a AND l[i + 1] = $b THEN $c
              WHEN l[i] = $b AND l[i - 1] = $a THEN -1
              ELSE l[i] END), x -> x != -1) AS l FROM bpe$k)"""
    }
    (s0 +: steps).mkString(",\n       ")
  }
}

/** Codegen expression: `text -> array<int>` of BPE token ids under
  * [[Bpe.Merges]] — the whole rank loop runs in one generated call with no
  * per-rank intermediate Columns (a Column-level fold of
  * transform/filter passes would keep ~2·ranks interpreted higher-order
  * lambdas per row on the hot path).
  */
final case class BpeEncode(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeUtf8(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Bpe.encodeUtf8($in);")

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}
