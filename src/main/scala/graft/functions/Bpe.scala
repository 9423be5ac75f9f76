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

  def encodeUtf8With(s: UTF8String, merges: scala.collection.Seq[(Int, Int, Int)]): ArrayData =
    new GenericArrayData(encode(s.toString, merges.toSeq))

  /** First merged id handed out by [[train]]: one past the last valid
    * Unicode code point, so a LEARNED id can never alias a real character
    * (the fixed toy table's 256+ ids rely on its test corpora staying
    * below U+0100; the trainer makes no such assumption).
    */
  val TrainIdBase: Int = 0x110000

  /** Distributed BPE TRAINER — the learning side of the apply loop above,
    * the way a pipeline actually produces the frozen merge table it ships
    * (SentencePiece/GPT-2 train once over the corpus, then every job runs
    * apply). Standard greedy algorithm: `nMerges` rounds of
    *
    *   1. tokenize the corpus under the merges learned so far (the codegen
    *      [[BpeEncodeWith]] — map-only scan);
    *   2. count every adjacent token pair (map-side-combinable aggregate —
    *      the only shuffle per round, over pair keys, not rows);
    *   3. adopt the most frequent pair as the next merge (count DESC, then
    *      (left, right) ASC — a total order, so training is deterministic
    *      on any partitioning).
    *
    * Candidate pairs with left == right are EXCLUDED (documented
    * constraint, same reason as the apply table: a self-pair's occurrences
    * overlap, making both the greedy pass order-dependent and the pair
    * count unequal to the applyable count; with left != right, adjacent
    * occurrences are provably disjoint, so the count IS the number of
    * merges one pass performs — and the SQL oracle stays loop-free).
    *
    * Driver state: one (pair, count) row per round. Scale shape: nMerges ×
    * (one corpus scan + one tiny aggregate) — the trainer is linear in
    * corpus bytes per round, and rounds are a small constant.
    *
    * @return (left, right, merged, count) per learned rank, merged ids
    *         from [[TrainIdBase]]
    */
  def train(docs: org.apache.spark.sql.DataFrame, text: org.apache.spark.sql.Column,
      nMerges: Int, minPairCount: Long = 2L): Seq[(Int, Int, Int, Long)] = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.Bridge
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    var continue = true
    while (continue && learned.size < nMerges) {
      val merges = learned.toSeq.map(m => (m._1, m._2, m._3))
      val toks = Bridge.column(BpeEncodeWith(Bridge.childExpr(text), merges))
      val best = docs
        .select(toks.as("l"))
        .select(explode(filter(
          transform(col("l"), (x, i) =>
            struct(x.as("a"), get(col("l"), i + 1).as("b"))),
          p => p.getField("b").isNotNull)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b")) // self-pairs excluded, see scaladoc
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect()
      best.headOption match {
        case Some(r) if r.getAs[Long]("cnt") >= minPairCount =>
          learned += ((r.getAs[Int]("a"), r.getAs[Int]("b"),
            TrainIdBase + learned.size, r.getAs[Long]("cnt")))
        case _ => continue = false
      }
    }
    learned.toSeq
  }

  /** Result of [[trainBatched]]: the learned table plus how many corpus
    * scans (rounds) it took — the observable the V/M round-count contract
    * is pinned on.
    */
  final case class BpeTraining(merges: Seq[(Int, Int, Int, Long)], rounds: Int)

  /** BATCHED BPE trainer — [[train]]'s scale path: each round adopts up to
    * `batchM` pairwise SYMBOL-DISJOINT pairs from ONE pair count instead
    * of one, so a vocabulary of V merges costs ~V/M corpus scans, not V
    * (the SentencePiece/HF-tokenizers production trainers batch the same
    * way). Selection per round is the exact greedy: walk pairs in
    * (count DESC, left, right) order, adopt a pair iff neither of its
    * symbols was used by an earlier adoption this round.
    *
    * Why disjointness is load-bearing (BpeSpec property-pins both laws):
    *
    *   - COUNTS STAY TRUE: merging (a,b)→X only touches positions holding
    *     a or b, and replaces two adjacent symbols with one new one — it
    *     can neither create nor destroy an occurrence of a symbol-disjoint
    *     pair (c,d) (a new (c,d) adjacency would need the merge to put c
    *     next to d, but the merge inserts X). So every adopted pair's
    *     pre-round count is still its exact applyable count at adoption.
    *   - ORDER DOESN'T MATTER: the same argument makes the round's merges
    *     commute, so the sequential rank-order apply ([[encode]]) equals a
    *     simultaneous round apply — which keeps the loop-free SQL oracle
    *     ([[duckdbTrainBatchedSql]]) exact, the same law the left≠right
    *     constraint buys within one pair.
    *
    * What batching changes vs sequential greedy: round k's later picks use
    * counts measured BEFORE round k's earlier picks, so a pair CREATED by
    * an earlier pick (one containing a fresh merged id) can't be adopted
    * until the next round. When the top-M pairs are symbol-disjoint and no
    * created pair would outrank them, batched ≡ sequential (spec-pinned
    * with batchM=1 ≡ [[train]] exactly, any batchM on disjoint fixtures).
    *
    * No silent caps: candidate pairs are fetched in bounded chunks but the
    * chunk query re-filters by the used-symbol set, so selection never
    * drops an eligible pair — a short chunk just means another tiny fetch
    * against the (checkpointed, pair-vocabulary-sized) count table. Driver
    * state per round: ≤ chunk rows. Scale shape per round: one codegen
    * re-tokenize scan + one map-side-combinable pair aggregate — identical
    * to [[train]], just ~M× fewer rounds.
    */
  def trainBatched(docs: org.apache.spark.sql.DataFrame, text: org.apache.spark.sql.Column,
      nMerges: Int, batchM: Int, minPairCount: Long = 2L): BpeTraining = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.Bridge
    require(batchM >= 1, "batchM must be >= 1")
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Long)]
    var rounds = 0
    var continue = true
    while (continue && learned.size < nMerges) {
      rounds += 1
      val merges = learned.toSeq.map(m => (m._1, m._2, m._3))
      val toks = Bridge.column(BpeEncodeWith(Bridge.childExpr(text), merges))
      // pair-vocabulary-sized (distinct (a,b) pairs), checkpointed so the
      // chunked selection below never re-scans the corpus
      val counts = docs
        .select(toks.as("l"))
        .select(explode(filter(
          transform(col("l"), (x, i) =>
            struct(x.as("a"), get(col("l"), i + 1).as("b"))),
          p => p.getField("b").isNotNull)).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b")) // self-pairs excluded, same as train
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minPairCount)
        .localCheckpoint()
      val want = math.min(batchM, nMerges - learned.size)
      val used = scala.collection.mutable.Set.empty[Int]
      var adopted = 0
      var exhausted = false
      while (adopted < want && !exhausted) {
        val eligible =
          if (used.isEmpty) counts
          else counts.filter(!col("a").isin(used.toSeq: _*) &&
            !col("b").isin(used.toSeq: _*))
        val chunk = eligible
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
          .limit(math.max(8 * want, 32)).collect()
        if (chunk.isEmpty) exhausted = true
        else {
          val before = adopted
          chunk.iterator.takeWhile(_ => adopted < want).foreach { r =>
            val (a, b) = (r.getAs[Int]("a"), r.getAs[Int]("b"))
            if (!used(a) && !used(b)) {
              learned += ((a, b, TrainIdBase + learned.size, r.getAs[Long]("cnt")))
              used += a; used += b; adopted += 1
            }
          }
          // a fully-blocked chunk that was ALSO the whole eligible set
          // means no disjoint pair remains this round
          if (adopted == before && chunk.length < math.max(8 * want, 32))
            exhausted = true
        }
      }
      // free the round's checkpointed count table deterministically (the
      // Bench.releaseCheckpoints device — Dataset.unpersist cannot touch
      // checkpoint storage)
      counts.queryExecution.logical.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }
      if (adopted == 0) continue = false
    }
    BpeTraining(learned.toSeq, rounds)
  }

  /** DuckDB CTE chain re-deriving [[trainBatched]] for the oracle — the
    * batched sibling of [[duckdbTrainSql]]. Per round k: `tt{k}` is the
    * corpus tokenized under everything learned so far; `p{k}` its pair
    * counts; the round's greedy disjoint selection UNROLLS into `batchM`
    * one-row CTEs `m{k}_{j}` — each the (count DESC, left, right) top
    * among pairs sharing no symbol with the round's earlier picks (exactly
    * the greedy walk, expressible without recursion because batchM is a
    * compile-time constant of the generated SQL); the round's apply CTE
    * replaces all `batchM` pairs SIMULTANEOUSLY (exact by symbol-
    * disjointness — see [[trainBatched]]). Merged ids are the
    * deterministic literals TrainIdBase + k·batchM + j.
    *
    * Oracle contract: every round must fill all `batchM` slots (the
    * one-row selection CTEs cross-join; an empty one would empty the
    * round) — the gate's corpus/parameters guarantee it, and a mismatch
    * reds the gate rather than passing silently.
    */
  def duckdbTrainBatchedSql(nRounds: Int, batchM: Int, src: String = "documents",
      textCol: String = "text", minPairCount: Int = 2): String = {
    val t0 =
      s"""tt0 AS (SELECT doc_id,
         list_transform(range(1, length($textCol) + 1), i -> unicode($textCol[i])) AS l
         FROM $src)"""
    def pairsOf(k: Int) =
      s"""p$k AS (
         SELECT a, b, count(*) AS cnt FROM (
           SELECT unnest(list_transform(range(1, len(l)), i ->
             struct_pack(a := l[i], b := l[i + 1])), recursive := true)
           FROM tt$k)
         WHERE a != b
         GROUP BY a, b HAVING count(*) >= $minPairCount)"""
    def selOf(k: Int, j: Int) = {
      val blockers = (0 until j).map(i => s"m${k}_$i s$i")
      val from = (s"p$k" +: blockers).mkString(", ")
      val notShared =
        if (j == 0) ""
        else " WHERE " + (0 until j).map(i =>
          s"p$k.a NOT IN (s$i.a, s$i.b) AND p$k.b NOT IN (s$i.a, s$i.b)").mkString(" AND ")
      s"""m${k}_$j AS (
         SELECT p$k.a, p$k.b, p$k.cnt FROM $from$notShared
         ORDER BY p$k.cnt DESC, p$k.a, p$k.b LIMIT 1)"""
    }
    def applyOf(k: Int) = {
      val from = (s"tt$k" +: (0 until batchM).map(j => s"m${k}_$j s$j")).mkString(", ")
      val startCases = (0 until batchM).map(j =>
        s"WHEN l[i] = s$j.a AND l[i + 1] = s$j.b THEN ${TrainIdBase + k * batchM + j}")
        .mkString("\n              ")
      val dropCond = (0 until batchM).map(j =>
        s"(l[i] = s$j.b AND l[i - 1] = s$j.a)").mkString(" OR ")
      s"""tt${k + 1} AS (
         SELECT doc_id, list_filter(list_transform(range(1, len(l) + 1), i ->
           CASE $startCases
              WHEN $dropCond THEN -1
              ELSE l[i] END), x -> x != -1) AS l
         FROM $from)"""
    }
    val ctes = (t0 +: (0 until nRounds).flatMap(k =>
      Seq(pairsOf(k)) ++ (0 until batchM).map(j => selOf(k, j)) ++
        (if (k < nRounds - 1) Seq(applyOf(k)) else Nil))).mkString(",\n       ")
    val sel = (for { k <- 0 until nRounds; j <- 0 until batchM } yield
      s"SELECT ${k * batchM + j} AS rank, a AS lhs, b AS rhs, " +
        s"${TrainIdBase + k * batchM + j} AS merged, cnt FROM m${k}_$j")
      .mkString("\n       UNION ALL ")
    s"""WITH $ctes
       $sel
       ORDER BY rank"""
  }

  /** DuckDB CTE chain re-deriving [[train]] for the oracle: per round k,
    * `tt{k}` is the corpus tokenized under the merges learned so far
    * (round 0 = raw code points) and `m{k}` is that round's winning pair
    * (count DESC, left, right — the same total order). The adopted pair is
    * data-dependent, so the NEXT round's replacement references `m{k}`'s
    * columns via a cross join instead of literals; the merged ID is the
    * deterministic literal TrainIdBase + k. The final learned table is the
    * union of the `m{k}` rows.
    */
  def duckdbTrainSql(nMerges: Int, src: String = "documents",
      textCol: String = "text"): String = {
    val t0 =
      s"""tt0 AS (SELECT doc_id,
         list_transform(range(1, length($textCol) + 1), i -> unicode($textCol[i])) AS l
         FROM $src)"""
    def bestOf(k: Int) =
      s"""m$k AS (
         SELECT a, b, count(*) AS cnt FROM (
           SELECT unnest(list_transform(range(1, len(l)), i ->
             struct_pack(a := l[i], b := l[i + 1])), recursive := true)
           FROM tt$k)
         WHERE a != b
         GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1)"""
    def applyOf(k: Int) = {
      val id = TrainIdBase + k
      s"""tt${k + 1} AS (
         SELECT doc_id, list_filter(list_transform(range(1, len(l) + 1), i ->
           CASE WHEN l[i] = m.a AND l[i + 1] = m.b THEN $id
                WHEN l[i] = m.b AND l[i - 1] = m.a THEN -1
                ELSE l[i] END), x -> x != -1) AS l
         FROM tt$k, m$k m)"""
    }
    val ctes = (t0 +: (0 until nMerges).flatMap(k =>
      Seq(bestOf(k)) ++ (if (k < nMerges - 1) Seq(applyOf(k)) else Nil))).mkString(",\n       ")
    val sel = (0 until nMerges).map(k =>
      s"SELECT $k AS rank, a AS lhs, b AS rhs, ${TrainIdBase + k} AS merged, cnt FROM m$k")
      .mkString("\n       UNION ALL ")
    s"""WITH $ctes
       $sel
       ORDER BY rank"""
  }

  /** DuckDB CTE chain re-deriving the encode for the oracle: `bpe0` splits
    * `textCol` into code points, then one CTE per rank applies the
    * simultaneous replacement (exact because left != right — see the
    * object doc): position i becomes `merged` when (l[i], l[i+1]) is the
    * pair, is dropped when it was consumed as a right element
    * (l[i-1], l[i]), and passes through otherwise. Out-of-range list
    * indexes (l[0], l[len+1]) are NULL in DuckDB, so the boundary
    * conditions fall out of three-valued logic. The final CTE is
    * `bpe${Merges.size}` with columns (doc_id, l).
    *
    * Oracle contract (applies to [[duckdbTrainSql]] too): the Spark side
    * splits by Unicode CODE POINT (`String.codePoints`), the SQL side by
    * DuckDB character indexing (`text[i]` / `length`) — these agree only
    * when the corpus contains no combining sequences (NFC text without
    * ZWJ/combining-mark clusters), which the fixtures satisfy. A fixture
    * refresh introducing NFD text would red these gates on correct code;
    * the fix would be grapheme-aware splitting on the Spark side, not a
    * code bug.
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

/** [[BpeEncode]] under an ARBITRARY merge table — the trainer's
  * re-tokenization primitive ([[Bpe.train]] round k encodes under the k
  * merges learned so far). The table is a compile-time-constant reference
  * object in generated code, so the per-row path is the same single call.
  */
final case class BpeEncodeWith(child: Expression, merges: Seq[(Int, Int, Int)])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_with expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    Bpe.encodeUtf8With(input.asInstanceOf[UTF8String], merges)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", merges, "scala.collection.Seq")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.Bpe.encodeUtf8With($in, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeWith =
    copy(child = newChild)
}
