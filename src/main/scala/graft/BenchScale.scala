package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress bench tier: the dedup / ANN / pipeline / text packs on a
  * SYNTHETIC 10× replication of sf0.1 (there is no driver-generated sf1).
  * This is the measured data point behind the scaladocs' scale claims
  * (bounded task memory, no n² blowup): a query whose time grows much
  * faster than the 10× data ratio has a super-linear plan regardless of
  * what its sf0.1 time looked like.
  *
  * Replication is STRUCTURE-PRESERVING, not duplication-inflating: naive
  * row copies would make every document a 10-way near-dup clique and every
  * pair query quadratically larger — measuring a different (and unrealistic)
  * workload. Instead each replica k gets:
  *  - documents: ids shifted by k·N; every token prefixed `r{k}_` (k>0), so
  *    replicas share no shingles — the dup-pair structure replicates
  *    linearly, per-replica token statistics keep their shape;
  *  - embeddings: ids shifted; dimensions circularly rotated by 7k — norms
  *    and within-replica cosines are exactly preserved, cross-replica
  *    cosines decorrelate (no synthetic near-dup inflation);
  *  - events / orders: ids (and user/customer keys) shifted so per-key
  *    group sizes stay constant while key cardinality grows 10× — the
  *    correct scale direction for groupBy/window/session shapes.
  * The fixed-size query/centroid sets (vec_id < 10 / < 8) land in replica 0
  * only: a growing corpus under a constant query set, which is exactly the
  * production scale path of the ANN queries.
  */
object BenchScale {

  val Reps = 10

  def synthesize(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    val fs = new java.io.File(outDir)
    if (new java.io.File(fs, "_DONE").exists()) return
    fs.mkdirs()

    def reps(df: DataFrame)(copy: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until Reps).map(k => copy(df, k)).reduce(_ union _)

    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val nDocs = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    reps(docs) { (df, k) =>
      val text =
        if (k == 0) col("text")
        else concat_ws(" ", transform(split(col("text"), " "), t => concat(lit(s"r${k}_"), t)))
      df.select((col("doc_id") + lit(k * nDocs)).as("doc_id"), text.as("text"),
        col("lang"), col("source"), length(text).cast("long").as("n_chars"))
    }.write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    val nVec = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
    reps(emb) { (df, k) =>
      val shift = (k * 7) % 64
      val rotated =
        if (shift == 0) col("embedding")
        else concat(slice(col("embedding"), shift + 1, 64 - shift),
          slice(col("embedding"), 1, shift))
      df.select((col("vec_id") + lit(k * nVec)).as("vec_id"),
        rotated.as("embedding"), col("label"))
    }.write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    // events.ts is TIMESTAMP(NANOS) in the source; QueryPack.t reads it as a
    // raw long (legacy conf) — replicate from the RAW read so the written
    // copy keeps the same long column the reader expects.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val events = spark.read.parquet(s"$srcDir/events.parquet")
    val nEv = events.agg(max(col("event_id"))).head().getLong(0) + 1
    val nUsr = events.agg(max(col("user_id"))).head().getLong(0) + 1
    reps(events) { (df, k) =>
      df.select((col("event_id") + lit(k * nEv)).as("event_id"), col("ts"),
        (col("user_id") + lit(k * nUsr)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val orders = spark.read.parquet(s"$srcDir/orders.parquet")
    val nOrd = orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val nCust = orders.agg(max(col("o_custkey"))).head().getLong(0) + 1
    reps(orders) { (df, k) =>
      df.select((col("o_orderkey") + lit(k * nOrd)).as("o_orderkey"),
        (col("o_custkey") + lit(k * nCust)).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    new java.io.File(fs, "_DONE").createNewFile()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_sf1")
    val artifact = args.headOption.getOrElse("BENCH_sf1.json")
    val spark = LocalSession.build()
    synthesize(spark, srcDir, outDir)

    val packs: Seq[queries.QueryPack] =
      Seq(queries.DedupQueries, queries.SimilarityQueries,
        queries.PipelineQueries, queries.TextQueries)
    val qs = packs.flatMap(_.queries).toMap
    // same methodology as Bench: untimed warmup, then min of 2 timed reps,
    // clearCache between runs (documented cache contract of the dedup ops)
    qs.foreach { case (_, fn) =>
      try Bench.materialize(fn(spark, outDir)) catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    val results = qs.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 2).flatMap { _ =>
        val t0 = System.nanoTime()
        val ok = try { Bench.materialize(fn(spark, outDir)); true } catch { case _: Throwable => false }
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) Some(t) else None
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qjson = results.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val json = s"""{"metric":"total_sf1","value":${fmt(total)},"unit":"sec","reps":2,"agg":"min","scale":"10x-$srcDir","queries":$qjson}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(artifact), json + "\n")
    catch { case _: Throwable => () }
    println(json)
    spark.stop()
  }
}
