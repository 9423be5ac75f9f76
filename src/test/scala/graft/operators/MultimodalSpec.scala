package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "hello world this is a doc"),
    (1L, "another document"),
    (2L, "x"),
    (3L, "")).toDF("doc_id", "text")

  test("media table: opaque binary payload + typed metadata") {
    val m = Multimodal.mediaFromDocuments(docs)
    assert(m.schema("payload").dataType == org.apache.spark.sql.types.BinaryType)
    val r = m.orderBy("doc_id").collect()
    assert(r(0).getAs[String]("media_type") == "image")
    assert(r(1).getAs[String]("media_type") == "audio")
    assert(r(2).getAs[String]("media_type") == "video")
    assert(r(0).getAs[org.apache.spark.sql.Row]("meta").getAs[Int]("n_bytes") == 25)
  }

  test("byte stride samples every k-th byte (codegen expression)") {
    val m = Multimodal.mediaFromDocuments(docs)
    val out = m.orderBy("doc_id")
      .select(Multimodal.strideSample(col("payload"), 3)).as[Array[Byte]].collect()
    assert(new String(out(0), "UTF-8") == "hlwltss c") // bytes 0,3,6,… of "hello world this is a doc"
    assert(out(3).length == 0) // empty payload → empty sample
  }

  test("byte resample: fixed output length, nearest-neighbor picks, empty stays empty") {
    val m = Multimodal.mediaFromDocuments(docs)
    val out = m.orderBy("doc_id")
      .select(Multimodal.resample(col("payload"), 8)).as[Array[Byte]].collect()
    val first = docs.orderBy("doc_id").select("text").as[String].head().getBytes("UTF-8")
    assert(out(0).length == 8)
    // out[i] = in[(i * len) / 8] — the exact floor map the oracle re-derives
    assert(out(0).toSeq == (0 until 8).map(i => first((i * first.length) / 8)).toSeq)
    assert(out(3).length == 0, "empty payload must resample to empty, not repeat a phantom byte")
    // upsampling a short payload repeats bytes but keeps length n
    val up = m.filter(col("doc_id") === 2).select(Multimodal.resample(col("payload"), 64))
      .as[Array[Byte]].head()
    assert(up.length == 64)
  }

  test("frameRms == brute-force per-frame RMS over signed bytes, partial tail included") {
    val m = Multimodal.mediaFromDocuments(docs)
    val out = m.orderBy("doc_id")
      .select(Multimodal.frameRms(col("payload"), 4)).as[Seq[Double]].collect()
    val texts = docs.orderBy("doc_id").select("text").as[String].collect()
    texts.zip(out).foreach { case (t, got) =>
      val bytes = t.getBytes("UTF-8")
      val expected = bytes.grouped(4).map { fr =>
        math.sqrt(fr.map(b => b.toDouble * b).sum / fr.length)
      }.toSeq
      assert(got.size == expected.size)
      got.zip(expected).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    }
    assert(out(3).isEmpty) // empty payload → no frames
    // signedness: bytes > 127 contribute as negatives, same magnitude
    val hi = Seq((9L, Array(0xFF.toByte, 0x80.toByte))).toDF("doc_id", "payload")
    val r = hi.select(Multimodal.frameRms(col("payload"), 2)).as[Seq[Double]].head()
    assert(math.abs(r.head - math.sqrt((1.0 + 128.0 * 128) / 2)) < 1e-12)
  }

  test("decodeFeatures: deterministic stub, one decoder per partition, streams rows") {
    val m = Multimodal.mediaFromDocuments(docs).repartition(2)
    val f1 = Multimodal.decodeFeatures(spark, m).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(spark, m).collect().sortBy(_.doc_id)
    assert(f1.toSeq == f2.toSeq) // deterministic
    assert(f1(0).media_type == "image" && f1(0).duration_ms == 0L)
    assert(f1(1).duration_ms == "another document".length * 10L)
    val h = f1(0)
    assert(h.width == 16 + ('h'.toInt % 64) * 16 && h.height == 16 + ('e'.toInt % 64) * 16)
    assert(math.abs(f1(3).mean_intensity) < 1e-9) // empty payload → 0 intensity
  }

  test("ImageIoDecoder: real PNG round trip, partition-parallel, analytic features") {
    // ids 0..19 cover every (width, height) = (8+id%8, 8+id%5) combination
    val ids = spark.range(0, 20).toDF("doc_id")
    val media = Multimodal.syntheticImages(spark, ids).repartition(4)
    // payloads are REAL PNGs (magic bytes), non-trivially sized
    val heads = media.select(substring(col("payload"), 1, 8)).as[Array[Byte]].collect()
    val pngMagic = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    assert(heads.forall(_.take(4).sameElements(pngMagic)))
    val out = Multimodal.decodeFeatures(spark, media, () => new Multimodal.ImageIoDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    (0L until 20L).foreach { id =>
      val f = out(id)
      val w = (8 + id % 8).toInt
      assert(f.width == w && f.height == (8 + id % 5).toInt && f.duration_ms == 0L)
      val expMean = (0 until w).map(x => (x * 255) / (w - 1)).sum.toDouble / w
      assert(math.abs(f.mean_intensity - expMean) < 1e-12,
        s"id=$id mean ${f.mean_intensity} vs $expMean")
    }
  }

  test("ImageIoDecoder: BMP decodes too; garbage/empty payloads yield the failure marker") {
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 3).foreach(y => (0 until 5).foreach(x => img.setRGB(x, y, 0x646464))) // gray 100
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val media = Seq(
      (1L, "image", bos.toByteArray),
      (2L, "image", "not an image at all".getBytes("UTF-8")),
      (3L, "image", Array.emptyByteArray))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.decodeFeatures(spark, media, () => new Multimodal.ImageIoDecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(1L).width == 5 && out(1L).height == 3 &&
      math.abs(out(1L).mean_intensity - 100.0) < 1e-12)
    assert(out(2L).width == -1 && out(2L).height == -1 && out(2L).mean_intensity == 0.0)
    assert(out(3L).width == -1 && out(3L).height == -1)
  }

  test("pHash60: empty payload is explicit 0 on the guarded path") {
    val h = Seq((1L, "")).toDF("id", "txt")
      .select(Multimodal.pHash60(encode(col("txt"), "UTF-8"))).as[Long].head()
    assert(h == 0L)
  }

  test("pHash60Fast (codegen DHash60) == built-ins pHash60 bit-exactly, incl. empty/short/high bytes") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // high bytes (>127) exercise unsigned-byte comparison; lengths around
    // the 61-sample grid exercise the floor-index arithmetic
    val payloads = Seq(
      Array.emptyByteArray,
      Array[Byte](1),
      Array[Byte](-1, -128, 127, 0, -1),
      Array.tabulate(60)(i => i.toByte),
      Array.tabulate(61)(i => (255 - i).toByte),
      Array.tabulate(62)(i => ((i * 37) % 256).toByte)) ++
      // randomized lengths across the 61-sample grid boundary (0..~1000)
      (1 to 150).map(_ => Array.fill(rnd.nextInt(1000))(rnd.nextInt(256).toByte)) :+
      Array.fill(4096)(rnd.nextInt(256).toByte)
    val df = payloads.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("id", "payload")
    val out = df.select(col("id"),
        Multimodal.pHash60(col("payload")).as("ref"),
        Multimodal.pHash60Fast(col("payload")).as("fast"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (id, ref, fast) => assert(ref == fast, s"payload $id: $ref != $fast") }
  }

  test("pHash60: near-identical payloads within small Hamming; unrelated far; fixed-grid handles any length") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = ("x" * 40) + ("the quick brown fox jumps over the lazy dog, " * 4)
    val rows = Seq(
      (1L, base),
      (2L, base.replace("lazy", "hazy")),            // near-identical
      (3L, "completely unrelated content " * 8),     // far
      (4L, base.take(30)))                           // shorter than the 61-sample grid
      .toDF("id", "txt")
      .select(col("id"), Multimodal.pHash60(encode(col("txt"), "UTF-8")).as("h"))
    val h = rows.as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h.values.forall(v => v >= 0 && v < (1L << 60))) // 60-bit positive
    assert(ham(h(1L), h(2L)) <= 6, s"near-dup hamming ${ham(h(1L), h(2L))}")
    assert(ham(h(1L), h(3L)) > 10, s"unrelated hamming ${ham(h(1L), h(3L))}")
    assert(h(4L) != h(1L)) // short payload still hashes (grid positions repeat)
  }
}
