package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Distributed Bloom filter as a pair of Catalyst primitives: an aggregate
  * that ORs per-row bit positions into an `array<bigint>` bitmap, and a
  * codegen probe expression testing a hash against that bitmap.
  *
  * The 100 TB shape this enables: build the bitmap over the CORPUS side
  * with ordinary map-side partial aggregation (each task ORs locally, the
  * shuffle carries one m-bit image per task, merge is bitwise OR — the
  * aggregate is commutative/idempotent, so Spark's partial-agg machinery
  * applies unchanged), then `broadcast` the single-row bitmap and probe the
  * FRESH side map-only — a seen-set membership test with ZERO shuffle of
  * the fresh data, vs. the equi-join formulation that shuffles both sides.
  * False positives are the documented Bloom trade; false negatives are
  * impossible. For corpora whose bitmap outgrows a broadcast (~GBs), the
  * same two primitives compose with a `pmod(hash, P)` pre-partitioning into
  * P smaller bitmaps joined on the partition key.
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing on a 60-bit input
  * hash `h` (e.g. [[TextFunctions.md5Hash60]], whose value is SQL-derivable
  * on the oracle side): `h1 = h >>> 30`, `h2 = ((h & 0x3FFFFFFF) << 1) | 1`
  * (odd, so it cycles the whole ring), `pos_i = (h1 + i*h2) mod m` for
  * `i < k`. All terms are non-negative and < 2^34, so the arithmetic is
  * exact in 64-bit and identical in any engine's BIGINT math.
  */
object Bloom {

  /** The i-th set-bit position for input hash `h` — the SINGLE definition
    * of the position math; the aggregate, the probe (interpreted and
    * generated), and the streaming dedup all route through it.
    */
  @inline def position(h: Long, i: Int, m: Int): Int = {
    val h1 = h >>> 30
    val h2 = ((h & 0x3FFFFFFFL) << 1) | 1L
    ((h1 + i * h2) % m).toInt
  }

  /** All k positions of `h`, filled into `out`. */
  @inline def positions(h: Long, m: Int, k: Int, out: Array[Int]): Unit = {
    var i = 0
    while (i < k) { out(i) = position(h, i, m); i += 1 }
  }

  /** Column API: OR-aggregate of the k bit positions of `hash` into an
    * m-bit bitmap (`array<bigint>` of m/64 words).
    */
  def bitmapAgg(hash: Column, m: Int, k: Int): Column =
    Bridge.column(BloomBitmapAgg(Bridge.childExpr(hash), m, k).toAggregateExpression())

  /** Column API: true iff all k positions of `hash` are set in `bitmap`. */
  def contains(hash: Column, bitmap: Column, m: Int, k: Int): Column =
    Bridge.column(BloomContains(Bridge.childExpr(hash), Bridge.childExpr(bitmap), m, k))

  /** The beyond-broadcast composition promised above: P independent
    * bitmaps, one per `pmod(hash, P)` shard, each over only its shard's
    * hashes. Total filter capacity is P × m bits while no single row,
    * broadcast, or state cell ever exceeds m/8 bytes — the corpus side
    * builds all shards in ONE aggregation (map-side partial ORs per
    * shard), and the fresh side probes via an equi-join on the shard id,
    * which at P ≫ broadcast threshold is a plain shuffled hash join whose
    * build side is P rows of m/8 bytes.
    *
    * Returns `(fresh columns..., maybe_member)`.
    */
  def partitionedProbe(
      corpus: org.apache.spark.sql.DataFrame, fresh: org.apache.spark.sql.DataFrame,
      hashCol: String, m: Int, k: Int, p: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, pmod, lit}
    require(p > 0, "p must be positive")
    val shards = corpus
      .groupBy(pmod(col(hashCol), lit(p)).as("__shard"))
      .agg(bitmapAgg(col(hashCol), m, k).as("__bm"))
    fresh
      .withColumn("__shard", pmod(col(hashCol), lit(p)))
      .join(shards, Seq("__shard"), "left")
      .withColumn("maybe_member",
        // a shard with no corpus rows has no bitmap row: definite miss
        org.apache.spark.sql.functions.coalesce(
          contains(col(hashCol), col("__bm"), m, k), lit(false)))
      .drop("__shard", "__bm")
  }
}

/** OR-aggregation of Bloom bit positions into a `long[]` bitmap buffer.
  * Buffer is the raw word array; serialize/deserialize is a flat byte image
  * (the TypedImperativeAggregate contract for shuffle-safe custom state).
  */
final case class BloomBitmapAgg(
    hash: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bitmap expects a bigint hash, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  @transient private lazy val pos = new Array[Int](k)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val h = hash.eval(input)
    if (h != null) {
      Bloom.positions(h.asInstanceOf[Long], m, k, pos)
      var i = 0
      while (i < k) {
        b(pos(i) >>> 6) |= 1L << (pos(i) & 63)
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bytes = java.nio.ByteBuffer.allocate(b.length * 8)
    bytes.asLongBuffer().put(b)
    bytes.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBitmapAgg =
    copy(hash = c.head)
}

/** Codegen membership probe: all-k-bits-set test against an `array<bigint>`
  * bitmap (typically a broadcast scalar riding in via a 1-row cross join).
  * Stays inside whole-stage codegen, so the fresh-side probe is a map-only
  * generated loop.
  */
final case class BloomContains(hash: Expression, bitmap: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def left: Expression = hash
  override def right: Expression = bitmap
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, bitmap.dataType) match {
      case (LongType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (h, b) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (bigint, array<bigint>), got ${h.catalogString}, ${b.catalogString}")
    }

  override def nullSafeEval(h: Any, bm: Any): Any =
    BloomContains.probe(h.asInstanceOf[Long], bm.asInstanceOf[ArrayData], m, k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, bm) =>
      s"${ev.value} = graft.functions.BloomContains.probe($h, $bm, $m, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomContains =
    copy(hash = l, bitmap = r)
}

object BloomContains {
  /** Shared by interpreted eval and generated code; position math delegates
    * to [[Bloom.position]] so the probe can never drift from the bits the
    * aggregate set (a mismatch would manifest as Bloom false negatives,
    * which the operator documents as impossible).
    */
  def probe(h: Long, bitmap: ArrayData, m: Int, k: Int): Boolean = {
    var i = 0
    while (i < k) {
      val p = Bloom.position(h, i, m)
      if ((bitmap.getLong(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }
}
