package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Bloom, TextFunctions}
import graft.functions.VectorFunctions.{dot, norm2}

/** Retrieval operators for training-data curation over `documents` /
  * `embeddings`: Okapi BM25 lexical scoring, reciprocal-rank-fusion hybrid
  * retrieval (BM25 ∪ embedding-cosine), and Bloom-filter corpus membership
  * — the seen-set primitive for incremental dedup at ingest.
  *
  * Scale notes per query are inline; the common theme is that every global
  * ranking is a bounded `TakeOrdered` (orderBy+limit, per-partition top-N
  * then a merge of N-row heads — never a full sort), and every corpus-level
  * statistic rides in as a broadcast 1-row aggregate.
  */
object RetrievalQueries extends QueryPack {

  // BM25 constants (Robertson–Spärck Jones defaults) and the fixed query.
  private val K1 = 1.2
  private val B = 0.75
  private val terms = Seq("data", "query", "join", "fast")

  // -- Okapi BM25 scoring ------------------------------------------------------------
  /** Per-document BM25 for the fixed term set. Shape: one shuffle for the
    * (doc, term) tf aggregate (carrying `dl` alongside `doc_id` — it is
    * functionally dependent, so no extra join for doc length), a tiny
    * ≤|terms|-row document-frequency aggregate joined back by broadcast,
    * and corpus stats (N, avgdl) as a broadcast 1-row cross join. At 100 TB
    * the only wide exchange is the tf aggregate, keyed on (doc, term) —
    * the classic inverted-index build — and the filter to the query's terms
    * happens BEFORE that shuffle, so the exchanged volume is per-query-term
    * postings, not the whole token stream.
    */
  private def bm25Scores(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
    val stats = docs.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val tf = docs
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        col("idf") * col("tf") * (lit(K1) + 1.0) /
          (col("tf") + lit(K1) * (lit(1.0) - B + lit(B) * col("dl") / col("avgdl"))))
      // Per-term contribs quantize to 9-decimal DECIMAL before the sum (the
      // t-test/covariance/dsir device; r9 ADVICE): the double sum's value
      // could land within an ulp of a 4-decimal rounding boundary and round
      // differently per engine — summing exact decimals makes the rounded
      // score engine-exact (residual risk is only a single CONTRIB sitting
      // on its own 1e-9 boundary, ulp-of-ln scale, not accumulated).
      .withColumn("contrib_q", round(col("contrib"), 9).cast("decimal(28,9)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib_q")), 4).cast("double").as("score"))
  }

  private val bm25ScoresSql =
    """WITH d AS (SELECT doc_id, len(string_split(text,' ')) AS dl FROM documents),
       stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM d),
       toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
       tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
              WHERE tok IN ('data','query','join','fast') GROUP BY 1,2),
       dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
       bm25 AS (
         SELECT t.doc_id,
                CAST(round(sum(CAST(round( ln(1 + (s.n - f.df + 0.5)/(f.df + 0.5))
                     * t.tf*(1.2+1) / (t.tf + 1.2*(1 - 0.75 + 0.75*d.dl/s.avgdl)), 9) AS DECIMAL(28,9))), 4) AS DOUBLE) AS score
         FROM tf t JOIN dfreq f USING (tok) JOIN d USING (doc_id) CROSS JOIN stats s
         GROUP BY 1)"""

  /** Top-20 documents by BM25. The ranking is orderBy+limit — Spark plans
    * `TakeOrderedAndProject` (per-partition 20-row heaps, merged on one
    * reducer), not a global sort. Tie order is (rounded score desc, doc_id)
    * on both sides, so the cut at 20 is engine-independent.
    */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    bm25Scores(s, dir).orderBy(col("score").desc, col("doc_id")).limit(20)

  private val qBm25Sql =
    bm25ScoresSql + "\n       SELECT doc_id, score FROM bm25 ORDER BY score DESC, doc_id LIMIT 20"

  // -- hybrid retrieval: reciprocal rank fusion --------------------------------------
  /** RRF (Cormack et al.) of a lexical and a dense ranking for one query:
    * `score(d) = Σ_lists 1/(60 + rank_list(d))`, absent-from-list counting
    * as 0. The lexical list is the BM25 top-100; the dense list is the
    * cosine top-100 against the query embedding (`vec_id = 0`, broadcast;
    * documents and embeddings share the 0..N-1 id domain in the driver
    * fixtures). Both candidate lists are bounded TakeOrdered results, so
    * the unpartitioned `row_number` windows that assign ranks each sort
    * exactly 100 rows on one task — the only all-to-one steps in the plan,
    * and both are O(list size), independent of corpus size. The fuse join
    * is a 100∪100-row broadcast-size outer join.
    */
  private def qRrf(s: SparkSession, dir: String): DataFrame = {
    val lexTop = bm25Scores(s, dir)
      .orderBy(col("score").desc, col("doc_id")).limit(100)
      .withColumn("lex_rn", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id").as("id"), col("lex_rn"))

    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"), norm2(col("embedding")).as("q_nrm"))
    val vecTop = emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n_nrm"))
      .crossJoin(broadcast(q))
      // rank on the ROUNDED cosine (same convention as the lexical side's
      // rounded BM25 score): the top-100 cut and rank order then only
      // depend on 6-decimal-stable values, not on both engines' cosine
      // formulations agreeing to the last ulp
      .withColumn("cos", round(
        dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("n_nrm")), 6))
      .orderBy(col("cos").desc, col("vec_id")).limit(100)
      .withColumn("vec_rn", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("id"), col("vec_rn"))

    lexTop.join(vecTop, Seq("id"), "full_outer")
      // 0 = absent from that ranker's top-100 (kept non-null so the
      // driver's hash compare never sees engine-specific null rendering)
      .select(col("id"),
        coalesce(col("lex_rn"), lit(0)).as("lex_rn"),
        coalesce(col("vec_rn"), lit(0)).as("vec_rn"))
      .withColumn("rrf", round(
        when(col("lex_rn") > 0, lit(1.0) / (lit(60) + col("lex_rn"))).otherwise(0.0) +
          when(col("vec_rn") > 0, lit(1.0) / (lit(60) + col("vec_rn"))).otherwise(0.0), 6))
      .orderBy(col("rrf").desc, col("id"))
      .limit(20)
  }

  private val qRrfSql =
    bm25ScoresSql + """,
       lex AS (SELECT doc_id AS id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rn
               FROM (SELECT * FROM bm25 ORDER BY score DESC, doc_id LIMIT 100)),
       q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       vtop AS (SELECT vec_id, round(list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]), 6) AS cos
                FROM embeddings e CROSS JOIN q WHERE e.vec_id != 0
                ORDER BY cos DESC, vec_id LIMIT 100),
       vec AS (SELECT vec_id AS id, row_number() OVER (ORDER BY cos DESC, vec_id) AS vec_rn FROM vtop),
       fused AS (
         SELECT coalesce(l.id, v.id) AS id,
                CAST(coalesce(l.lex_rn, 0) AS INT) AS lex_rn,
                CAST(coalesce(v.vec_rn, 0) AS INT) AS vec_rn,
                round(CASE WHEN l.lex_rn IS NULL THEN 0 ELSE 1.0/(60 + l.lex_rn) END +
                      CASE WHEN v.vec_rn IS NULL THEN 0 ELSE 1.0/(60 + v.vec_rn) END, 6) AS rrf
         FROM lex l FULL OUTER JOIN vec v ON l.id = v.id)
       SELECT id, lex_rn, vec_rn, rrf FROM fused ORDER BY rrf DESC, id LIMIT 20"""

  // -- Bloom-filter corpus membership ------------------------------------------------
  private val bloomM = 65536 // bits; 1 KiB bitmap — demo-sized, same plan at GBs
  private val bloomK = 4

  /** Seen-set membership of "fresh" documents (odd doc_id) against the
    * "corpus" (even doc_id), via an m-bit Bloom bitmap built with
    * [[graft.functions.BloomBitmapAgg]] over the corpus's
    * [[TextFunctions.md5Hash60]] content fingerprints and probed with the
    * codegen [[graft.functions.BloomContains]].
    *
    * The plan is the 100 TB seen-set shape: corpus side reduces to ONE
    * bitmap row via ordinary partial aggregation (map tasks OR locally;
    * the exchange carries one 1 KiB image per task), the bitmap broadcasts,
    * and the fresh side is probed map-only — no shuffle of fresh data, no
    * equi-join against the corpus. The oracle re-derives the identical
    * Kirsch–Mitzenmacher positions in SQL and unions corpus bits with
    * DISTINCT, so reported false positives match bit-for-bit.
    */
  private def qBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
      .select(col("doc_id"), TextFunctions.md5Hash60(col("text")).as("fp"))
    val bitmap = docs.filter(col("doc_id") % 2 === 0)
      .agg(Bloom.bitmapAgg(col("fp"), bloomM, bloomK).as("bm"))
    docs.filter(col("doc_id") % 2 === 1)
      .crossJoin(broadcast(bitmap))
      .select(col("doc_id"), Bloom.contains(col("fp"), col("bm"), bloomM, bloomK).as("maybe_member"))
      .orderBy("doc_id")
  }

  private val qBloomSql =
    """WITH fp AS (SELECT doc_id, ('0x' || substr(md5(text), 1, 15))::BIGINT AS fp FROM documents),
       ks AS (SELECT unnest(range(4)) AS i),
       cbits AS (SELECT DISTINCT ((fp // 1073741824) + i * ((fp % 1073741824)*2 + 1)) % 65536 AS pos
                 FROM fp CROSS JOIN ks WHERE doc_id % 2 = 0),
       fbits AS (SELECT doc_id, ((fp // 1073741824) + i * ((fp % 1073741824)*2 + 1)) % 65536 AS pos
                 FROM fp CROSS JOIN ks WHERE doc_id % 2 = 1)
       SELECT f.doc_id, (count(c.pos) = 4) AS maybe_member
       FROM fbits f LEFT JOIN cbits c ON f.pos = c.pos
       GROUP BY f.doc_id ORDER BY f.doc_id"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bm25_topk" -> (qBm25 _),
    "retrieval_rrf_fusion" -> (qRrf _),
    "dedup_bloom_probe" -> (qBloom _))

  override val oracles: Map[String, String] = Map(
    "text_bm25_topk" -> qBm25Sql,
    "retrieval_rrf_fusion" -> qRrfSql,
    "dedup_bloom_probe" -> qBloomSql)
}
