package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal-column operators over a media table derived deterministically
  * from `documents` (payload = UTF-8 bytes as opaque blob; the driver
  * testdata has no binary table). Byte-level features are oracle-checked;
  * the stride sampler and the stubbed decoder (engine-specific byte
  * plumbing DuckDB can't express over blobs) get rows-only checks plus
  * ScalaTest coverage.
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

  // -- stride sampling (frame-sample access pattern; rows-only) ------------------
  private def qStride(s: SparkSession, dir: String): DataFrame =
    media(s, dir)
      .select(
        col("doc_id"),
        length(Multimodal.strideSample(col("payload"), 7)).as("n_sampled"),
        sha2(Multimodal.strideSample(col("payload"), 7), 256).as("sample_fp"))
      .orderBy("doc_id")

  // -- stubbed decode + featurize via mapPartitions (rows-only) ------------------
  private def qDecode(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(s, media(s, dir)).toDF()
      .select(col("doc_id"), col("media_type"), col("width"), col("height"),
        col("duration_ms"), round(col("mean_intensity"), 4).as("mean_intensity"))
      .orderBy("doc_id")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_byte_features" -> (qByteFeatures _),
    "mm_stride_sample" -> (qStride _),
    "mm_decode_features" -> (qDecode _))

  override val oracles: Map[String, String] = Map(
    "mm_byte_features" -> qByteFeaturesSql)
}
