package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal-column operators over a media table derived deterministically
  * from `documents` (payload = UTF-8 bytes as opaque blob; the driver
  * testdata has no binary table). All three are oracle-checked: DuckDB
  * reaches individual payload bytes via hex() decomposition, so the stride
  * sampler and the deterministic fake decoder compare exactly.
  */
object MultimodalQueries extends QueryPack {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(t(s, dir, "documents"))

  // -- codegen byte features (size / fingerprint / head) -------------------------
  private def qByteFeatures(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .select(
        col("doc_id"),
        col("media_type"),
        col("meta.n_bytes").as("n_bytes"),
        sha2(col("payload"), 256).as("fp"),
        base64(encode(substring(lower(col("media_type")), 1, 3), "UTF-8")).as("fmt_b64"))
      .orderBy("doc_id")

  private val qByteFeaturesSql =
    """SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       sha256(text) AS fp,
       to_base64(encode(left(CASE WHEN doc_id % 3 = 0 THEN 'ima' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END, 3))) AS fmt_b64
       FROM documents ORDER BY doc_id"""

  // -- stride sampling (frame-sample access pattern) -----------------------------
  // Sampled bytes emitted as hex (not sha2): DuckDB's sha256 takes VARCHAR
  // only, and sampled UTF-8 bytes can be invalid as a string — hex compares
  // the exact same bytes and keeps the query oracle-checkable.
  private def qStride(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .select(
        col("doc_id"),
        length(Multimodal.strideSample(col("payload"), 7)).as("n_sampled"),
        hex(Multimodal.strideSample(col("payload"), 7)).as("sample_hex"))
      .orderBy("doc_id")

  private val qStrideSql =
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents)
       SELECT doc_id,
         CAST(ceil(n / 7.0) AS INT) AS n_sampled,
         array_to_string(list_transform(range(0, n, 7), i -> substring(hx, CAST(i*2+1 AS INT), 2)), '') AS sample_hex
       FROM h ORDER BY doc_id"""

  // -- fixed-length resample (1-D resize) ----------------------------------------
  // Variable-length payloads → 16 bytes by nearest neighbor; hex output for
  // the same invalid-UTF-8 reason as the stride gate. Pure map, no shuffle
  // beyond the output sort.
  private def qResample(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .select(
        col("doc_id"),
        length(col("payload")).as("n_in"),
        hex(Multimodal.resample(col("payload"), 16)).as("resampled_hex"))
      .orderBy("doc_id")

  private val qResampleSql =
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents)
       SELECT doc_id, CAST(n AS INT) AS n_in,
         CASE WHEN n = 0 THEN '' ELSE
           array_to_string(list_transform(range(0, 16), i -> substring(hx, CAST((i*n//16)*2+1 AS INT), 2)), '')
         END AS resampled_hex
       FROM h ORDER BY doc_id"""

  // -- perceptual fingerprint (media near-dup primitive) -------------------------
  // The 60-bit dHash per payload plus its four 15-bit pigeonhole bands —
  // the persistable index a media-dedup pipeline stores; pair-finding over
  // it is the SimHash band join (dedup_simhash gates that machinery; this
  // corpus has no perceptual near-dups — min pairwise Hamming is 12 — so
  // the gate verifies the hash itself bit-exactly, and MultimodalSpec
  // verifies pair detection on synthetic near-identical payloads).
  private def qPhash(s: SparkSession, dir: String): DataFrame = {
    // Codegen single-pass dHash (DHash60; bit-identical to the built-ins
    // pHash60 the oracle mirrors — spec-verified), staged so the four band
    // columns derive from the hash ATTRIBUTE. The original single-select
    // built-ins form repeated the full pHash tree per band column and
    // re-hex-encoded the payload inside each of its ~120 sampled-byte
    // references: 6 s at sf0.1 vs ~0.2 s now, identical output.
    val bands = (0 until 4).map(b =>
      shiftright(col("phash"), b * 15).bitwiseAND(lit(32767L)).as(s"band$b"))
    media(s, dir)
      .select(col("doc_id"), Multimodal.pHash60Fast(col("payload")).as("phash"))
      .select(col("doc_id") +: col("phash") +: bands: _*)
      .orderBy("doc_id")
  }

  private val qPhashSql = {
    // m > 0 guard mirrors pHash60's: on an empty payload the unguarded
    // ('0x' || '')::BIGINT is a conversion ERROR in DuckDB (not a NULL), so
    // one empty document would fail the whole oracle query
    val bytesCte = (0 to 60).map(i =>
      s"(CASE WHEN m > 0 THEN ('0x' || substr(hx, CAST(floor($i*m/61.0) AS INT)*2+1, 2))::BIGINT ELSE 0 END) AS b$i").mkString(", ")
    val bits = (0 until 60).map(i =>
      s"(CASE WHEN b$i < b${i + 1} THEN (1::BIGINT << $i) ELSE 0 END)").mkString(" + ")
    s"""WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS m
           FROM documents),
       b AS (SELECT doc_id, $bytesCte FROM h),
       sig AS (SELECT doc_id, $bits AS phash FROM b)
       SELECT doc_id, phash,
         (phash >> 0) & 32767 AS band0, (phash >> 15) & 32767 AS band1,
         (phash >> 30) & 32767 AS band2, (phash >> 45) & 32767 AS band3
       FROM sig ORDER BY doc_id"""
  }

  // -- stubbed decode + featurize via mapPartitions ------------------------------
  private def qDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(s, media(s, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("duration_ms"), round(col("mean_intensity"), 4).as("mean_intensity"))
      .orderBy("doc_id")

  // The DeterministicFakeDecoder's features re-derived byte-for-byte in SQL:
  // hex() decomposition reaches payload bytes (width/height from bytes 0/1,
  // mean over all bytes), so even the stub decode path is hash-verified.
  private val qDecodeSql =
    """WITH h AS (SELECT doc_id,
           CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS media_type,
           hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
       b AS (SELECT doc_id, media_type, n,
           list_transform(range(0, n), i ->
             (strpos('0123456789ABCDEF', substring(hx, CAST(i*2+1 AS INT), 1))-1)*16
             + strpos('0123456789ABCDEF', substring(hx, CAST(i*2+2 AS INT), 1))-1) AS bytes
         FROM h)
       SELECT doc_id, media_type,
         CAST(16 + (CASE WHEN n = 0 THEN 0 ELSE bytes[1] % 64 END) * 16 AS INT) AS width,
         CAST(16 + (CASE WHEN n < 2 THEN 0 ELSE bytes[2] % 64 END) * 16 AS INT) AS height,
         CAST(CASE WHEN media_type = 'image' THEN 0 ELSE n * 10 END AS BIGINT) AS duration_ms,
         round(CASE WHEN n = 0 THEN 0.0 ELSE list_sum(bytes) * 1.0 / n END, 4) AS mean_intensity
       FROM b ORDER BY doc_id"""

  // -- REAL image decode via javax.imageio (encode→decode round trip) ------------
  // Synthetic gradient PNGs (dimensions + mean intensity are closed-form in
  // doc_id — see Multimodal.syntheticPng) are encoded partition-parallel,
  // then decoded back by the real ImageIoDecoder through the same
  // mapPartitions plumbing as the stub path. The oracle re-derives the
  // analytic features in SQL, so the full round trip — AWT raster encode,
  // PNG bytes, ImageIO decode, channel-sum mean — is hash-verified.
  private def qDecodeReal(s: SparkSession, dir: String): DataFrame = {
    val imgs = Multimodal.syntheticImages(s, t(s, dir, "documents"))
    Multimodal.decodeFeatures(s, imgs, () => new Multimodal.ImageIoDecoder).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("duration_ms"),
        round(col("mean_intensity"), 4).as("mean_intensity"))
      .orderBy("doc_id")
  }

  private val qDecodeRealSql =
    """SELECT doc_id,
       CAST(8 + doc_id % 8 AS INT) AS width,
       CAST(8 + doc_id % 5 AS INT) AS height,
       CAST(0 AS BIGINT) AS duration_ms,
       round(list_sum(list_transform(range(0, CAST(8 + doc_id % 8 AS INT)),
         x -> (x*255) // (7 + doc_id % 8))) * 1.0 / (8 + doc_id % 8), 4) AS mean_intensity
       FROM documents ORDER BY doc_id"""

  // -- per-frame RMS energy (audio waveform features) ----------------------------
  // Payload as signed 8-bit samples, 64-sample frames; per doc: frame count,
  // the peak frame's index and its RMS. One codegen pass per row — the
  // feature-extraction shape an audio pipeline runs corpus-wide.
  private def qFrameEnergy(s: SparkSession, dir: String): DataFrame = {
    val frames = Multimodal.frameRms(col("payload"), 64)
    media(s, dir)
      .select(col("doc_id"), frames.as("frames"))
      .select(col("doc_id"),
        size(col("frames")).as("n_frames"),
        array_position(col("frames"), array_max(col("frames"))).cast("int").as("peak_frame"),
        round(array_max(col("frames")), 4).as("peak_rms"))
      .orderBy("doc_id")
  }

  // signed-byte re-derivation: hex pairs → unsigned 0..255 → v-256 when >127
  private val qFrameEnergySql =
    """WITH h AS (SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n FROM documents),
       b AS (SELECT doc_id, n,
           list_transform(range(0, n), i ->
             CASE WHEN ((strpos('0123456789ABCDEF', substring(hx, CAST(i*2+1 AS INT), 1))-1)*16
                 + strpos('0123456789ABCDEF', substring(hx, CAST(i*2+2 AS INT), 1))-1) > 127
               THEN ((strpos('0123456789ABCDEF', substring(hx, CAST(i*2+1 AS INT), 1))-1)*16
                 + strpos('0123456789ABCDEF', substring(hx, CAST(i*2+2 AS INT), 1))-1) - 256
               ELSE ((strpos('0123456789ABCDEF', substring(hx, CAST(i*2+1 AS INT), 1))-1)*16
                 + strpos('0123456789ABCDEF', substring(hx, CAST(i*2+2 AS INT), 1))-1) END) AS v
         FROM h),
       f AS (SELECT doc_id, n,
           list_transform(range(0, CAST(ceil(n/64.0) AS INT)), fi ->
             sqrt(list_sum(list_transform(list_slice(v, CAST(fi*64+1 AS INT), CAST(least((fi+1)*64, n) AS INT)),
                  x -> x*x*1.0)) / (least((fi+1)*64, n) - fi*64))) AS frames
         FROM b)
       SELECT doc_id,
         CAST(len(frames) AS INT) AS n_frames,
         CAST(list_position(frames, list_max(frames)) AS INT) AS peak_frame,
         round(list_max(frames), 4) AS peak_rms
       FROM f ORDER BY doc_id"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_byte_features" -> (qByteFeatures _),
    "mm_stride_sample" -> (qStride _),
    "mm_resample_fixed" -> (qResample _),
    "mm_frame_energy" -> (qFrameEnergy _),
    "mm_phash" -> (qPhash _),
    "mm_decode_features" -> (qDecode _),
    "mm_decode_real" -> (qDecodeReal _))

  override val oracles: Map[String, String] = Map(
    "mm_byte_features" -> qByteFeaturesSql,
    "mm_stride_sample" -> qStrideSql,
    "mm_resample_fixed" -> qResampleSql,
    "mm_frame_energy" -> qFrameEnergySql,
    "mm_phash" -> qPhashSql,
    "mm_decode_features" -> qDecodeSql,
    "mm_decode_real" -> qDecodeRealSql)
}
