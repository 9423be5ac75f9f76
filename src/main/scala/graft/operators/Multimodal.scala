package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: media payloads as opaque
  * `binary` columns with typed metadata, plus partition-parallel decode /
  * feature-extraction plumbing.
  *
  * The decode step itself is STUBBED (no image/audio codecs in this
  * environment) behind [[MediaDecoder]]; [[DeterministicFakeDecoder]] derives
  * stable pseudo-features from the bytes so the Spark-side plumbing — schema,
  * batch shape, partitioning, null/short-payload handling — is real and
  * testable end-to-end. Swap in a codec-backed decoder on a real cluster
  * without touching the pipeline.
  *
  * Scale notes: feature extraction is embarrassingly parallel map work
  * (`mapPartitions`, no shuffle); decoder construction is per-partition, not
  * per-row, mirroring how a JNI codec or model handle would be initialized
  * once per task. Byte-level ops (fingerprint, size, stride sampling) are
  * pure Catalyst expressions and stay in whole-stage codegen.
  */
object Multimodal {

  /** media(doc_id, media_type, payload, meta) — payload is opaque binary. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType),
      StructField("declared_format", StringType))))))

  /** Build a media table from any (id, text) source — the payload is the
    * UTF-8 bytes treated as an opaque blob. (The driver testdata carries no
    * binary table; deriving one deterministically keeps every downstream op
    * oracle-checkable.)
    */
  def mediaFromDocuments(docs: DataFrame, id: String = "doc_id", text: String = "text"): DataFrame =
    docs.select(
      col(id).cast("long").as("doc_id"),
      (when(col(id) % 3 === 0, "image").when(col(id) % 3 === 1, "audio").otherwise("video"))
        .as("media_type"),
      encode(col(text), "UTF-8").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("int").as("n_bytes"),
        (when(col("media_type") === "image", "png")
          .when(col("media_type") === "audio", "wav").otherwise("mp4")).as("declared_format")))

  /** Pure-expression byte features: size, sha2-256 fingerprint, head bytes —
    * all codegen, no UDF.
    */
  def byteFeatures(media: DataFrame): DataFrame =
    media.select(
      col("doc_id"),
      col("media_type"),
      col("meta.n_bytes").as("n_bytes"),
      sha2(col("payload"), 256).as("fp"),
      base64(substring(col("payload"), 1, 8)).as("head_b64"))

  /** "Frame sampling": every k-th byte of the payload as a new binary —
    * the stride access pattern of video frame extraction, as a codegen
    * Catalyst expression ([[graft.functions.ByteStride]]; no UDF).
    */
  def strideSample(payload: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.functions.ByteStride(Bridge.childExpr(payload), k))
  }

  /** Per-frame RMS energy over the payload as signed 8-bit samples — the
    * audio waveform feature primitive ([[graft.functions.FrameRms]],
    * codegen; trailing partial frame included).
    */
  def frameRms(payload: org.apache.spark.sql.Column, frameLen: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.functions.FrameRms(Bridge.childExpr(payload), frameLen))
  }

  /** Nearest-neighbor resample to a fixed byte length — the 1-D resize that
    * turns variable-length media into fixed-shape feature vectors
    * ([[graft.functions.ByteResample]], codegen).
    */
  def resample(payload: org.apache.spark.sql.Column, n: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.functions.ByteResample(Bridge.childExpr(payload), n))
  }

  /** 60-bit difference-hash (dHash) of a binary payload — the perceptual
    * fingerprint for MEDIA near-dup detection: resample 61 bytes at evenly
    * spaced positions (the "resize to a fixed grid" step of an image
    * dHash, position i → byte at floor(i·len/61)), then bit i = whether
    * sample i is less than sample i+1. Near-identical payloads (re-encoded,
    * truncated, padded media) land within a small Hamming distance;
    * pair-finding is the same pigeonhole band join as SimHash
    * ([[Dedup.simHashDuplicates]]). 60 bits (not 64) keeps the value
    * positive in a signed 64-bit lane, so every downstream shift/mask is
    * SQL-re-derivable — the md5Hash60 convention.
    *
    * Built from codegen built-ins (hex/substring/conv) — a wide but static
    * expression tree; the i·len/61 products stay far below 2^53 so the
    * double floor is exact on any engine.
    */
  def pHash60(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    pHash60FromHex(hex(payload), length(payload))
  }

  /** Codegen single-pass dHash ([[graft.functions.DHash60]]) — the corpus
    * scan path; bit-identical to [[pHash60]] (spec-verified), which remains
    * the SQL-re-derivable reference formulation the oracle mirrors.
    */
  def pHash60Fast(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.functions.DHash60(Bridge.childExpr(payload)))
  }

  /** [[pHash60]] over an ALREADY-STAGED hex string + byte length. Corpus
    * scans should bind `hex(payload)` / `length(payload)` to their own
    * projection columns and pass the attributes: the bit tree references
    * the hex input ~120 times (two sampled bytes per bit), so handing this
    * an inline `hex(payload)` tree re-hex-encodes the payload per
    * reference (measured 6 s for 5 000 docs at sf0.1 vs ~1 s staged).
    */
  def pHash60FromHex(hx: org.apache.spark.sql.Column,
      m: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // long arithmetic: an Int product i*len overflows at ~36 MB payloads
    // (ANSI: throws; legacy: wraps negative and reads bytes from the wrong
    // end via negative substr)
    def byteAt(i: Int) =
      conv(hx.substr((floor(lit(i.toLong) * m.cast("long") / 61.0).cast("long") * 2L + 1L)
        .cast("int"), lit(2)), 16, 10)
        .cast("long")
    val bits = (0 until 60).map { i =>
      when(byteAt(i) < byteAt(i + 1), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // empty payload → 0 EXPLICITLY (not via conv('')-is-null falling through
    // each bit's otherwise-0): the SQL dual guards the same way, where the
    // unguarded ('0x' || '')::BIGINT would error out, not diverge
    when(m > 0, bits).otherwise(lit(0L))
  }

  // -- partition-parallel decode plumbing (the mapInPandas analogue) ------------

  /** Decoded feature row. */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, width: Int, height: Int,
      duration_ms: Long, mean_intensity: Double)

  /** Pluggable decoder; constructed once per partition (like a codec/model
    * handle). Implementations must be Serializable-free: only the factory
    * closure ships to executors.
    */
  trait MediaDecoder {
    def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Raw
  }
  object MediaFeatures { final case class Raw(width: Int, height: Int, durationMs: Long, meanIntensity: Double) }

  /** STUB decoder — deterministic pseudo-features from the bytes (no codecs
    * in this container). A real deployment replaces exactly this class.
    */
  final class DeterministicFakeDecoder extends MediaDecoder {
    override def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Raw = {
      val n = payload.length
      var acc = 0L
      var i = 0
      while (i < n) { acc += (payload(i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else acc.toDouble / n
      MediaFeatures.Raw(
        width = 16 + (if (n == 0) 0 else (payload(0) & 0xff) % 64) * 16,
        height = 16 + (if (n < 2) 0 else (payload(1) & 0xff) % 64) * 16,
        durationMs = if (mediaType == "image") 0L else n.toLong * 10,
        meanIntensity = mean)
    }
  }

  /** REAL image decoder over `javax.imageio` (JDK-native — PNG/BMP/GIF/JPEG,
    * no external codecs): width/height from the decoded raster,
    * mean_intensity = mean over pixels of (r+g+b)/3. Undecodable or empty
    * payloads yield the (-1, -1) failure marker rather than throwing — a
    * corpus-scale decode pass must tag-and-filter bad media, not die on the
    * first truncated file. Images have no duration (0).
    *
    * This is the swap-in the [[DeterministicFakeDecoder]] scaladoc promises:
    * same trait, same per-partition construction, exercised end-to-end by
    * the `mm_decode_real` gate query on deterministic synthetic PNGs.
    */
  /** One-time per-JVM ImageIO configuration: ImageIO defaults to
    * DISK-backed stream caches, so every encode/decode creates and deletes
    * a temp file under java.io.tmpdir. Invisible at spec scale; at corpus
    * scale it is a super-linear cliff — the r13 byte-adjudicated growth
    * gate measured mm_decode_real at 22.7× time on 10.3× bytes into the
    * 100× tier (≈1M temp-file create/deletes churning one directory's
    * metadata across 32 threads). Memory-cached streams restore
    * byte-linearity; media payloads here are KB-sized, so the memory cost
    * is nil. Referenced from every encode/decode entry point so any
    * executor JVM configures itself on first use.
    */
  private object ImageIoConfig {
    javax.imageio.ImageIO.setUseCache(false)
  }

  final class ImageIoDecoder extends MediaDecoder {
    ImageIoConfig
    override def decode(mediaType: String, payload: Array[Byte]): MediaFeatures.Raw = {
      // NonFatal, not just IOException: the JDK codec plugins throw runtime
      // exceptions (IndexOutOfBounds, NegativeArraySize, CMMException, …) on
      // corrupt payloads — any of them must become the failure marker, not a
      // task failure
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) MediaFeatures.Raw(-1, -1, 0L, 0.0)
      else {
        val (w, h) = (img.getWidth, img.getHeight)
        // exact integer channel sum in a long; ONE double division at the
        // end — deterministic regardless of raster traversal order
        var acc = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            acc += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        MediaFeatures.Raw(w, h, 0L, if (n == 0) 0.0 else acc.toDouble / (3.0 * n))
      }
    }
  }

  /** Deterministic synthetic PNG for a row id: width 8+(id%8), height
    * 8+(id%5), every pixel in column x the gray value (x*255)/(w-1) — a
    * horizontal gradient whose dimensions and mean intensity are closed-form
    * functions of the id, so a real encode→decode round trip stays
    * oracle-checkable in plain SQL (the driver testdata has no binary
    * media column to decode).
    */
  def syntheticPng(id: Long): Array[Byte] = {
    ImageIoConfig // memory-cached streams — see the object's scaladoc
    // floorMod: Scala % yields negative remainders for negative ids, which
    // would make w = 1 and the gradient divide 0/0. The SQL dual's closed
    // form applies to the (non-negative) fixture id domain; floorMod keeps
    // the function total on any long without changing it there.
    val w = 8 + java.lang.Math.floorMod(id, 8L).toInt
    val h = 8 + java.lang.Math.floorMod(id, 5L).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = (x * 255) / (w - 1)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A media table of real (synthetic-gradient) PNGs, one per document id —
    * encoding runs partition-parallel in the same mapPartitions shape as
    * decode (per-partition encoder state, streaming, no shuffle).
    */
  def syntheticImages(spark: SparkSession, docs: DataFrame, id: String = "doc_id"): DataFrame = {
    import spark.implicits._
    docs.select(col(id).cast("long")).as[Long]
      .mapPartitions(_.map(i => (i, "image", syntheticPng(i))))
      .toDF("doc_id", "media_type", "payload")
  }

  /** Decode + featurize, one decoder per partition, streaming through rows
    * (never materializing a partition in memory) — the Scala analogue of a
    * `mapInPandas` batch UDF.
    */
  def decodeFeatures(spark: SparkSession, media: DataFrame,
      mkDecoder: () => MediaDecoder = () => new DeterministicFakeDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "media_type", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val dec = mkDecoder() // once per partition
        rows.map { case (id, mt, payload) =>
          val r = dec.decode(mt, if (payload == null) Array.emptyByteArray else payload)
          MediaFeatures(id, mt, r.width, r.height, r.durationMs, r.meanIntensity)
        }
      }
  }
}
