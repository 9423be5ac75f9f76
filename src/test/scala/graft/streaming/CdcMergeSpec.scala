package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Top-level for Encoder derivation. */
case class CdcChange(k: Long, v: String, version: Long)

/** Streaming CDC merge: the snapshot after N micro-batches equals the batch
  * upsert of all changes, including multi-version batches and cross-batch
  * overwrites.
  */
class CdcMergeSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("foreachBatch CDC merge: snapshot == last-write-wins over all batches") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc").toString
    val snapshot = s"$dir/snapshot"
    val in = MemoryStream[CdcChange]
    val q = EventStreams.startCdcMerge(in.toDF(), snapshot, Seq("k"), "version",
      checkpointDir = s"$dir/ckpt")
    try {
      in.addData(CdcChange(1, "a", 1), CdcChange(2, "b", 1), CdcChange(3, "c", 1))
      q.processAllAvailable()
      // batch 2: cross-batch overwrite of k=2 (twice, in-batch versions) + insert
      in.addData(CdcChange(2, "b2", 2), CdcChange(4, "d", 1), CdcChange(2, "b3", 3))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapshot).as[CdcChange].collect().toSet
      assert(snap == Set(
        CdcChange(1, "a", 1), CdcChange(2, "b3", 3),
        CdcChange(3, "c", 1), CdcChange(4, "d", 1)))
    } finally q.stop()
  }

  test("interrupted swap: a snapshot stranded at .old is restored, not rebuilt from empty") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc2").toString
    val snapshot = s"$dir/snapshot"
    val in = MemoryStream[CdcChange]
    val q = EventStreams.startCdcMerge(in.toDF(), snapshot, Seq("k"), "version",
      checkpointDir = s"$dir/ckpt")
    try {
      in.addData(CdcChange(1, "a", 1), CdcChange(2, "b", 1))
      q.processAllAvailable()
      // simulate a crash between "move snapshot aside" and "move tmp in":
      // only the .old directory exists when the next batch runs
      assert(new java.io.File(snapshot).renameTo(new java.io.File(snapshot + ".old")))
      in.addData(CdcChange(3, "c", 1))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapshot).as[CdcChange].collect().toSet
      assert(snap == Set(CdcChange(1, "a", 1), CdcChange(2, "b", 1), CdcChange(3, "c", 1)))
    } finally q.stop()
  }
}
