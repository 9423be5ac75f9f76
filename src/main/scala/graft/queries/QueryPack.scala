package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries plus (where ANSI-SQL-expressible) DuckDB oracle
  * SQL for the driver's correctness gate.
  *
  * Conventions (required for the oracle hash-compare to be meaningful):
  *  - every query's output is deterministically and totally ordered;
  *  - every floating-point aggregate is rounded identically on both sides;
  *  - output column types are aligned (the oracle SQL casts DuckDB's wider
  *    defaults — BIGINT year(), HUGEINT sum(int) — down to Spark's types);
  *  - no raw TIMESTAMP columns in output (epoch seconds or DATE instead),
  *    sidestepping timezone/precision representation differences.
  */
trait QueryPack {
  /** name -> (session, sfDir) -> result DataFrame. */
  def queries: Map[String, (SparkSession, String) => DataFrame]

  /** DuckDB-runnable SQL for the subset of `queries` that is expressible;
    * keys are a subset of `queries.keySet`. Unlisted queries get the
    * driver's weaker rows-only check.
    */
  def oracles: Map[String, String]

  /** Load one of the driver-generated parquet tables.
    *
    * `events.ts` has drifted across fixture generations: TIMESTAMP(NANOS)
    * (which Spark 4 only reads as a raw long under the legacy conf) vs
    * TIMESTAMP(MICROS) `isAdjustedToUTC=false` (which Spark reads natively
    * as TIMESTAMP_NTZ). Branch on the dtype Spark actually infers so either
    * vintage of fixture yields the same session-TZ (UTC) TimestampType
    * column:
    *  - LongType → nanos-as-long: floor-truncate to micros with integer
    *    division (double division would lose precision at 1e18 nanos —
    *    beyond the 53-bit mantissa); DuckDB floor-truncates identically.
    *  - TimestampNTZType → reinterpret the wall-clock as session TZ (UTC),
    *    matching DuckDB's naive-timestamp reading of the same file.
    *  - TimestampType → already aligned; pass through.
    * Any other dtype fails loudly so fixture drift is one visible error,
    * not N silently-broken gates.
    */
  protected def t(s: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    FixtureSchemas.assertMatches(name, df.schema)
    // Normalize EVERY timestamp-vintage column the schema guard accepts
    // (events.ts, o_orderdate, l_shipdate) — accepting a vintage in the
    // guard but not normalizing it here would re-create the round-8
    // failure shape on the next drift: assert passes, N gates then die in
    // analysis.
    FixtureSchemas.timestampColumns(name).foldLeft(df) { (acc, cn) =>
      acc.schema(cn).dataType match {
        case LongType =>
          acc.withColumn(cn, timestamp_micros(expr(s"$cn div 1000")))
        case TimestampNTZType =>
          // NTZ→Timestamp cast interprets the wall-clock in the session TZ,
          // which LocalSession/Verify/Bench all pin to UTC.
          acc.withColumn(cn, col(cn).cast(TimestampType))
        case TimestampType => acc
        case other =>
          throw new IllegalStateException(
            s"$name.$cn read as unexpected type $other (fixture drift? " +
              "expected LongType nanos, TIMESTAMP_NTZ micros, or TIMESTAMP)")
      }
    }
  }
}

/** Expected driver-fixture schemas (FIXTURES.md §A). The driver regenerates
  * the parquet between rounds and has already drifted once (events.ts
  * `timestamp[ns]` → `timestamp[us]`, silently breaking 14 gates in round
  * 8); this guard turns any future drift into ONE loud, named error at the
  * first table read instead of N cryptic per-gate analysis failures.
  *
  * Timestamp columns accept every vintage seen so far — raw long
  * (nanos-as-long legacy read), TIMESTAMP_NTZ, or session-TZ TIMESTAMP —
  * because `QueryPack.t` normalizes them; everything else must match
  * exactly (names, order, and type).
  */
private[queries] object FixtureSchemas {
  import org.apache.spark.sql.types._

  private val anyTs: DataType => Boolean = {
    case LongType | TimestampNTZType | TimestampType => true
    case _ => false
  }
  private def exact(t: DataType): DataType => Boolean = _ == t

  /** One expected column: name, acceptance predicate, human-readable type
    * for the drift error, and an EXPLICIT timestamp-vintage tag. The tag —
    * not predicate object identity — drives `timestampColumns`, so a
    * refactor that eta-expands or inlines `anyTs` cannot silently empty
    * the normalization set while the guard still accepts the vintages
    * (the round-8 failure shape; r9 ADVICE).
    */
  private final case class ColRule(
      name: String, ok: DataType => Boolean, want: String,
      timestampVintage: Boolean = false)

  private val expected: Map[String, Seq[ColRule]] = {
    def c(n: String, t: DataType) = ColRule(n, exact(t), t.simpleString)
    def ts(n: String) =
      ColRule(n, anyTs, "timestamp-like (long|timestamp_ntz|timestamp)", timestampVintage = true)
    Map(
      "region" -> Seq(c("r_regionkey", IntegerType), c("r_name", StringType)),
      "nation" -> Seq(c("n_nationkey", IntegerType), c("n_name", StringType),
        c("n_regionkey", IntegerType)),
      "customer" -> Seq(c("c_custkey", LongType), c("c_name", StringType),
        c("c_nationkey", IntegerType), c("c_acctbal", DoubleType),
        c("c_mktsegment", StringType)),
      "supplier" -> Seq(c("s_suppkey", LongType), c("s_name", StringType),
        c("s_nationkey", IntegerType), c("s_acctbal", DoubleType)),
      "part" -> Seq(c("p_partkey", LongType), c("p_name", StringType),
        c("p_brand", StringType), c("p_type", StringType),
        c("p_size", IntegerType), c("p_retailprice", DoubleType)),
      "orders" -> Seq(c("o_orderkey", LongType), c("o_custkey", LongType),
        c("o_orderstatus", StringType), c("o_totalprice", DoubleType),
        ts("o_orderdate"), c("o_orderpriority", StringType)),
      "lineitem" -> Seq(c("l_orderkey", LongType), c("l_partkey", LongType),
        c("l_suppkey", LongType), c("l_linenumber", IntegerType),
        c("l_quantity", DoubleType), c("l_extendedprice", DoubleType),
        c("l_discount", DoubleType), c("l_tax", DoubleType),
        c("l_returnflag", StringType), c("l_linestatus", StringType),
        ts("l_shipdate")),
      "events" -> Seq(c("event_id", LongType), ts("ts"),
        c("user_id", LongType), c("event_type", StringType),
        c("value", DoubleType), c("props", StringType)),
      "documents" -> Seq(c("doc_id", LongType), c("text", StringType),
        c("lang", StringType), c("source", StringType),
        c("n_chars", LongType)),
      "embeddings" -> Seq(c("vec_id", LongType),
        ColRule("embedding", {
          case ArrayType(FloatType, _) => true
          case _ => false
        }, "array<float>"),
        c("label", IntegerType)))
  }

  /** Columns declared timestamp-vintage for `name` — `QueryPack.t`
    * normalizes exactly this set, so guard acceptance and normalization
    * cannot diverge.
    */
  def timestampColumns(name: String): Seq[String] =
    expected.getOrElse(name, Nil).collect { case r if r.timestampVintage => r.name }

  def assertMatches(name: String, actual: StructType): Unit =
    expected.get(name).foreach { exp =>
      val problems = Seq.newBuilder[String]
      val got = actual.fields.map(f => f.name -> f.dataType)
      val expNames = exp.map(_.name)
      val missing = expNames.diff(got.map(_._1))
      val extra = got.map(_._1).diff(expNames)
      if (missing.nonEmpty) problems += s"missing columns: ${missing.mkString(", ")}"
      if (extra.nonEmpty) problems += s"unexpected columns: ${extra.mkString(", ")}"
      // order matters too: specs and the oracle compare read positionally
      if (missing.isEmpty && extra.isEmpty && got.map(_._1).toSeq != expNames)
        problems += s"column order drifted: got ${got.map(_._1).mkString(", ")}"
      exp.foreach { r =>
        got.collectFirst { case (r.name, dt) => dt } match {
          case Some(dt) if !r.ok(dt) =>
            problems += s"${r.name}: got ${dt.simpleString}, expected ${r.want}"
          case _ => ()
        }
      }
      val ps = problems.result()
      if (ps.nonEmpty)
        throw new IllegalStateException(
          s"fixture schema drift in table '$name' — ${ps.mkString("; ")}. " +
            "The driver regenerated the parquet with a different schema; " +
            "update FixtureSchemas/QueryPack.t (see FIXTURES.md §A).")
    }
}
