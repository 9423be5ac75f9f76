package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The codes schema marker (`_schema.json` inside the codes directory):
  * full-rows maintenance reads (upsert rewrite, streaming replay check,
  * compaction) used to pay an all-footers mergeSchema job per mutation
  * batch — O(files in the index) metadata reads at 100 TB. The marker holds
  * the union schema in one file; these tests pin its lifecycle and every
  * crash/fallback window:
  *
  *  - a fresh [[VectorIndex.write]] stamps the marker and the explicit-
  *    schema read round-trips the rows;
  *  - a SUPERSET marker (the only state the superset-first write order can
  *    leave behind a crash) reads the phantom column as all-null — exactly
  *    the mergeSchema semantics for files lacking a column;
  *  - a torn/garbage marker and an absent marker (legacy index) both fall
  *    back to the all-footers merge, so absence is always safe.
  */
class VectorIndexSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val pq = PqParams(m = 4, subDim = 16, k = 16)

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  private def freshIndex(): String = {
    val path = java.nio.file.Files.createTempDirectory("graft_schema_marker").toString
    val quant = VectorIndex.train(emb, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(emb, col("vec_id"), col("embedding"), quant), path)
    path
  }

  private def rm(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
  }

  private def markerFile(path: String) =
    new java.io.File(s"$path/codes/_schema.json")

  private def writeMarkerRaw(path: String, content: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$path/codes/_schema.json"), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  test("write() stamps the marker; the explicit-schema read round-trips the codes") {
    val path = freshIndex()
    try {
      assert(markerFile(path).isFile, "write() must stamp _schema.json")
      val marker = VectorIndex.readSchemaMarker(spark, s"$path/codes")
      assert(marker.isDefined)
      val full = VectorIndex.loadCodesFull(spark, path)
      assert(full.schema.fieldNames.toSet ===
        Set("vec_id", "cell", "m", "code"))
      // the partition column is declared in the marker, not re-inferred from
      // directory names — `cell` must come back as the written long
      assert(full.schema("cell").dataType ===
        org.apache.spark.sql.types.LongType)
      // row-level equality against the projected search read
      val viaSearch = VectorIndex.loadCodes(spark, path)
        .orderBy("vec_id", "m").collect().toSeq
      val viaFull = full.select(col("vec_id"), col("cell"), col("m"), col("code"))
        .orderBy("vec_id", "m").collect().toSeq
      assert(viaFull === viaSearch)
    } finally rm(new java.io.File(path))
  }

  test("superset marker (crash window): phantom column reads all-null, answers unchanged") {
    val path = freshIndex()
    try {
      // simulate the one state superset-first can leave: marker widened for
      // a stamped append whose data write never landed
      val st = VectorIndex.readSchemaMarker(spark, s"$path/codes").get
      val widened = org.apache.spark.sql.types.StructType(st.fields :+
        org.apache.spark.sql.types.StructField("__batch",
          org.apache.spark.sql.types.LongType, nullable = true))
      // through the Hadoop fs (not java.nio): the local fs is checksummed,
      // and a bare-file overwrite leaves a stale .crc that fails the read
      writeMarkerRaw(path, widened.json)
      val full = VectorIndex.loadCodesFull(spark, path)
      assert(full.schema.fieldNames.contains("__batch"))
      assert(full.filter(col("__batch").isNotNull).count() === 0L,
        "a column no file carries must read as all-null")
      // and the maintenance path over it still converges: a no-op-shaped
      // upsert (update one vector) answers like the rebuild-equivalence
      // tests require — exercised here just for execution, equality is
      // pinned by VectorIndexSpec's upsert suite
      val upd = emb.filter(col("vec_id") === 20)
        .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
      VectorIndex.upsertBatch(spark, path, upd,
        upd.limit(0).select(col("vec_id")), col("vec_id"), col("embedding"), pq)
      assert(VectorIndex.loadCodes(spark, path)
        .filter(col("vec_id") === 20).count() === pq.m.toLong)
    } finally rm(new java.io.File(path))
  }

  test("garbage and absent markers fall back to the footer merge (legacy read)") {
    val path = freshIndex()
    try {
      val expect = VectorIndex.loadCodesFull(spark, path)
        .orderBy("vec_id", "m").collect().toSeq
      // torn marker: unparseable JSON must behave as absent
      writeMarkerRaw(path, "{torn")
      assert(VectorIndex.readSchemaMarker(spark, s"$path/codes").isEmpty)
      assert(VectorIndex.loadCodesFull(spark, path)
        .orderBy("vec_id", "m").collect().toSeq === expect)
      // absent marker: the pre-marker index layout
      assert(markerFile(path).delete())
      assert(VectorIndex.loadCodesFull(spark, path)
        .orderBy("vec_id", "m").collect().toSeq === expect)
    } finally rm(new java.io.File(path))
  }
}
