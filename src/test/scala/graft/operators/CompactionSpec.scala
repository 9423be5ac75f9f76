package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Compaction: many tiny files in, few target-sized files out, no rows
  * gained or lost, and the sorted variant leaves each output file covering
  * a disjoint key range (what makes parquet min/max pruning effective).
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private def parquetFiles(dir: String) =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))

  test("compacts a many-file input into the computed number of files, lossless") {
    val src = java.nio.file.Files.createTempDirectory("graft-tiny").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    (1 to 5000).map(i => (i.toLong, s"row$i")).toDF("id", "v")
      .repartition(64).write.mode("overwrite").parquet(src) // 64 tiny files
    assert(parquetFiles(src).length == 64)

    val df = spark.read.parquet(src)
    Compaction.compact(df, out, targetFileBytes = 64 << 10) // ~64 KiB targets
    val files = parquetFiles(out)
    assert(files.length < 64, s"still ${files.length} files")
    val back = spark.read.parquet(out)
    assert(back.count() == 5000)
    assert(back.agg(sum("id")).head().getLong(0) == 5000L * 5001 / 2)
  }

  test("sorted compaction: output files cover disjoint id ranges") {
    val src = java.nio.file.Files.createTempDirectory("graft-tiny2").toString
    val out = java.nio.file.Files.createTempDirectory("graft-compact2").toString
    (1 to 2000).map(i => (i.toLong, i % 7)).toDF("id", "k")
      .repartition(16).write.mode("overwrite").parquet(src)
    Compaction.compact(spark.read.parquet(src), out,
      targetFileBytes = 8 << 10, sortCols = Seq("id"))
    // per-file (min,max) ranges must not overlap
    val ranges = parquetFiles(out).map { f =>
      val r = spark.read.parquet(f.getAbsolutePath).agg(min("id"), max("id")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"overlapping file ranges: $ranges")
      case _ => ()
    }
    assert(ranges.length > 1) // actually split into multiple ranged files
  }
}
