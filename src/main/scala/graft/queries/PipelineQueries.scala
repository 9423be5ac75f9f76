package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._
import graft.operators.Dedup

/** Training-data pipeline operators beyond curation filtering: deterministic
  * train/valid/test splitting, token-budget batch packing, benchmark
  * contamination detection, int8 embedding quantization, and class-balance
  * reweighting. All five are oracle-checked.
  *
  * Scale notes:
  *  - the split is a pure map (hash of the id — no shuffle, no global state,
  *    stable under re-runs and re-partitioning, the property that matters
  *    when the corpus is re-materialized);
  *  - packing windows per lang shard, not globally — a single global
  *    running sum would serialize 100 TB through one partition;
  *  - contamination is an inverted-index equi-join on the shingle, never a
  *    doc×doc comparison;
  *  - quantization is embarrassingly parallel map work.
  */
object PipelineQueries extends QueryPack {

  /** The pack's shared bucketing identity: first 4 hex digits of
    * md5(id-as-string) mod `mod`. md5 (not xxhash64) so the same assignment
    * is reproducible in any engine — every sampler below and its SQL dual
    * (`('0x'||substring(md5(CAST(id AS VARCHAR)),1,4))::INT % mod`) must
    * share this one recipe.
    */
  private def md5Bucket(id: org.apache.spark.sql.Column, mod: Int): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 4), 16, 10).cast("int") % mod

  // -- deterministic hash split --------------------------------------------------
  // Bucket mod 10 → 8/1/1 split.
  private def qSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = md5Bucket(col("doc_id"), 10)
    t(s, dir, "documents")
      .withColumn("split",
        when(bucket < 8, "train").when(bucket === 8, "valid").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("split", "lang")
  }

  private val qSplitSql =
    """SELECT CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'valid' ELSE 'test' END AS split,
              lang, count(*) AS n
       FROM (SELECT lang,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 10 AS b
             FROM documents)
       GROUP BY 1, 2 ORDER BY split, lang"""

  // -- token-budget batch packing --------------------------------------------------
  // batch_id = floor(exclusive-running-token-sum / budget) within each lang
  // shard ordered by doc_id — the fixed-budget packing a context-window
  // batcher does, expressed as one window (no iterative loop).
  private def qPack(s: SparkSession, dir: String): DataFrame = {
    val nTok = size(split(col("text"), " "))
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, dir, "documents")
      .select(col("lang"), col("doc_id"), nTok.as("nt"))
      .withColumn("batch_id", floor(coalesce(sum(col("nt")).over(w), lit(0L)) / lit(512)))
      .groupBy(col("lang"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
      .orderBy("lang", "batch_id")
  }

  private val qPackSql =
    """WITH d AS (SELECT lang, doc_id, len(string_split(text, ' ')) AS nt FROM documents),
       c AS (SELECT lang, doc_id, nt,
               coalesce(sum(nt) OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ce
             FROM d)
       SELECT lang, CAST(floor(ce / 512) AS BIGINT) AS batch_id,
              count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS sum_tokens
       FROM c GROUP BY lang, batch_id ORDER BY lang, batch_id"""

  // -- token-level sequence packing (tokenize → pack) -------------------------------
  /** GPT-style training-sequence assembly over REAL BPE token ids — the
    * composition a pretraining pipeline actually runs: each document is
    * encoded under the frozen merge table ([[graft.functions.BpeEncode]],
    * the whole rank loop in one codegen call), an EOS sentinel (-1 —
    * outside every valid id space, since code points and learned merge
    * ids are nonnegative) closes each document, and the doc_id-ordered
    * global token stream is sliced into fixed 16-token sequences. One row
    * per sequence: token count (16 except the tail), a position-weighted
    * id checksum, and doc attribution (distinct docs + first doc) — the
    * metadata a packed-example writer carries.
    *
    * Scale shape — a GLOBAL running offset without a global window: docs
    * bucket by doc_id range (4096 docs/bucket); per-bucket token totals
    * are a tiny aggregate (ndocs/4096 rows) whose exclusive prefix sum is
    * bounded driver state broadcast back; within-bucket offsets window
    * per bucket PARTITION (never a single global sort). The only
    * per-token exchange is the seq_id aggregate.
    */
  private def qPackTokens(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.Bridge
    val L = 16
    val bucketDocs = 4096
    // localCheckpoint: the token stream feeds TWO consumers (the bucket
    // totals and the pack pass) — materialize the encode once instead of
    // running the per-rank BPE loop over every document twice
    val toks = t(s, dir, "documents")
      .select(col("doc_id"),
        concat(
          Bridge.column(graft.functions.BpeEncode(Bridge.childExpr(col("text")))),
          array(lit(-1))).as("l"))
      .withColumn("b", floor(col("doc_id") / bucketDocs).cast("long"))
      .localCheckpoint()
    val totals = toks.groupBy(col("b"))
      .agg(sum(size(col("l")).cast("long")).as("bn"))
      .orderBy("b").collect()
    var acc = 0L
    val bucketOffs = totals.map { r =>
      val o = (r.getLong(0), acc); acc += r.getLong(1); o
    }.toSeq
    import s.implicits._
    val boff = broadcast(bucketOffs.toDF("b", "boff"))
    val w = Window.partitionBy(col("b")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    toks.join(boff, "b")
      .withColumn("off",
        coalesce(sum(size(col("l")).cast("long")).over(w), lit(0L)) + col("boff"))
      .select(col("doc_id"),
        explode(transform(col("l"), (tk, i) =>
          struct((col("off") + i).as("gpos"), tk.as("tok")))).as("p"))
      .select(col("doc_id"), col("p.gpos").as("gpos"), col("p.tok").as("tok"))
      .groupBy(floor(col("gpos") / L).cast("long").as("seq_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("tok").cast("long") * (pmod(col("gpos"), lit(L)) + 1L)).as("tok_hash"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("doc_lo"))
      .orderBy("seq_id")
  }

  private lazy val qPackTokensSql =
    s"""WITH ${graft.functions.Bpe.duckdbCtes()},
       toksp AS (SELECT doc_id, l || [-1] AS l
                 FROM bpe${graft.functions.Bpe.Merges.size}),
       offs AS (SELECT doc_id, l,
           COALESCE(SUM(len(l)) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         FROM toksp),
       flat AS (
         SELECT doc_id,
           unnest(list_transform(range(1, len(l) + 1), i ->
             struct_pack(gpos := off + i - 1, tok := l[i])), recursive := true)
         FROM offs)
       SELECT CAST(gpos // 16 AS BIGINT) AS seq_id,
         count(*) AS n_tokens,
         CAST(SUM(tok * ((gpos % 16) + 1)) AS BIGINT) AS tok_hash,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         MIN(doc_id) AS doc_lo
       FROM flat GROUP BY seq_id ORDER BY seq_id"""

  // -- benchmark contamination ------------------------------------------------------
  // "Benchmark" set = doc_id % 97 == 0 (stand-in for an eval suite); a train
  // doc is contaminated if it shares any 5-token shingle with a benchmark
  // doc. Scale shape: shingles are HASHED in one codegen pass (longs, never
  // 30-byte strings, through the shuffle) and the benchmark side is
  // BROADCAST — an eval suite is small by nature, so the corpus-sized train
  // explode never shuffles at all. Equal to the string-shingle oracle up to
  // 64-bit hash collisions (~1e-6 at 5M shingles; the gate would catch one).
  private def qContamination(s: SparkSession, dir: String): DataFrame = {
    def shingled(df: DataFrame) =
      df.select(col("doc_id"), Dedup.shingleHashes(col("text"), 5).as("sh"))
    val docs = t(s, dir, "documents")
    val bench = shingled(docs.filter(col("doc_id") % 97 === 0))
      .select(col("doc_id").as("bench_id"), explode(col("sh")).as("g"))
    val train = shingled(docs.filter(col("doc_id") % 97 =!= 0))
      .select(col("doc_id"), explode(col("sh")).as("g"))
    train.join(broadcast(bench), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("bench_id")).as("n_bench_docs"))
      .orderBy("doc_id")
  }

  private val qContaminationSql =
    """WITH sh AS (
         SELECT doc_id, list_distinct(list_transform(
                  range(1, greatest(len(string_split(text,' ')) - 3, 1)),
                  i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' ||
                       string_split(text,' ')[i+2] || ' ' || string_split(text,' ')[i+3] || ' ' ||
                       string_split(text,' ')[i+4])) AS g
         FROM documents),
       bench AS (SELECT doc_id AS bench_id, unnest(g) AS tok FROM sh WHERE bench_id % 97 = 0),
       train AS (SELECT doc_id, unnest(g) AS tok FROM sh WHERE doc_id % 97 != 0)
       SELECT doc_id, count(DISTINCT bench_id) AS n_bench_docs
       FROM train JOIN bench USING (tok)
       GROUP BY doc_id ORDER BY doc_id"""

  // -- NEAR-DUP benchmark contamination ----------------------------------------------
  // The exact-shingle gate above catches verbatim leakage; real eval
  // contamination is usually a lightly-edited copy, which only a near-dup
  // check finds (the Lee et al. / GPT-3 appendix-C lesson). Eval set =
  // doc_id % 7 == 0 (a denser stand-in than the exact gate's % 97, so the
  // gate is non-vacuous on the test corpora); a train doc contaminates an
  // eval doc when 3-token-shingle Jaccard >= 0.8. Composed from
  // Dedup.minHashIncremental with train as the corpus and the (small) eval
  // suite as the fresh side — the production shape: the corpus-sized train
  // set is banded but NEVER self-joined or re-shuffled, the eval suite
  // broadcasts, and LSH recall above 0.8 with (nHashes=64, r=2) is
  // 1-(1-0.8^2)^32 ≈ 1-4e-15, so the exhaustive-Jaccard oracle is exact.
  private def qContaminationFuzzy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minHashIncremental(
      corpus = docs.filter(col("doc_id") % 7 =!= 0),
      fresh = docs.filter(col("doc_id") % 7 === 0),
      id = col("doc_id"), text = col("text"), shingleWidth = 3, threshold = 0.8)
    pairs
      // eval-eval near-dups (both ids in the suite) are not contamination
      .filter((col("id_a") % 7 === 0) =!= (col("id_b") % 7 === 0))
      .select(
        when(col("id_a") % 7 === 0, col("id_a")).otherwise(col("id_b")).as("bench_id"),
        col("jaccard"))
      .groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_train_dups"), round(max(col("jaccard")), 4).as("max_jaccard"))
      .orderBy("bench_id")
  }

  private val qContaminationFuzzySql =
    """WITH d AS (
         SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
                i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
         FROM documents),
       toks AS (SELECT doc_id, unnest(sh) AS tok FROM d),
       sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       inter AS (SELECT t.doc_id AS train_id, e.doc_id AS bench_id, count(*) AS i
                 FROM toks t JOIN toks e ON t.tok = e.tok
                 WHERE t.doc_id % 7 != 0 AND e.doc_id % 7 = 0
                 GROUP BY 1, 2),
       j AS (SELECT bench_id, train_id, i*1.0/(st.sz + se.sz - i) AS jac
             FROM inter JOIN sizes st ON train_id = st.doc_id
                        JOIN sizes se ON bench_id = se.doc_id)
       SELECT bench_id, CAST(count(*) AS BIGINT) AS n_train_dups,
              round(max(jac), 4) AS max_jaccard
       FROM j WHERE jac >= 0.8 GROUP BY bench_id ORDER BY bench_id"""

  // -- int8 symmetric quantization -------------------------------------------------
  // scale = 127 / max|x|; q = floor(x*scale + 0.5) — explicit floor-based
  // half-up so Spark and DuckDB round identically (their round() halfway
  // conventions differ).
  private def qQuantize(s: SparkSession, dir: String): DataFrame = {
    val v = transform(col("embedding"), x => x.cast("double"))
    val amax = array_max(transform(v, x => abs(x)))
    // nullif guard: an all-zero vector would make scale infinite and
    // floor(0·∞ + 0.5) NaN, which ANSI-mode int casts reject — null instead.
    val scale = lit(127.0) / nullif(amax, lit(0.0))
    val q = transform(v, x => floor(x * scale + lit(0.5)).cast("int"))
    t(s, dir, "embeddings")
      .select(col("vec_id"), round(scale, 6).as("scale"),
        aggregate(q, lit(0L), (acc, x) => acc + x).as("q_sum"),
        array_min(q).as("q_min"), array_max(q).as("q_max"))
      .orderBy("vec_id")
  }

  private val qQuantizeSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       s AS (SELECT vec_id, v, CAST(127 AS DOUBLE) / nullif(list_max(list_transform(v, x -> abs(x))), 0.0) AS scale FROM e),
       q AS (SELECT vec_id, scale, list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INT)) AS qs FROM s)
       SELECT vec_id, round(scale, 6) AS scale, CAST(list_sum(qs) AS BIGINT) AS q_sum,
              list_min(qs) AS q_min, list_max(qs) AS q_max
       FROM q ORDER BY vec_id"""

  // -- class-balance reweighting ----------------------------------------------------
  // weight(label) = N / (k * n_label) — the standard inverse-frequency
  // balancing factor; the totals come from an empty-frame window over the
  // (tiny) per-label aggregate, not a second corpus pass.
  private def qClassWeights(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy()
    t(s, dir, "embeddings")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
      .withColumn("weight",
        round(sum(col("n")).over(w).cast("double") / (count(lit(1)).over(w) * col("n")), 6))
      .orderBy("label")
  }

  private val qClassWeightsSql =
    """SELECT label, n,
              round(CAST(sum(n) OVER () AS DOUBLE) / (count(*) OVER () * n), 6) AS weight
       FROM (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
       ORDER BY label"""

  // -- stratified deterministic sampling ---------------------------------------------
  // Per-stratum rates (downsample the dominant language, keep the tail)
  // applied via the same md5-bucket trick as the split: a pure map,
  // reproducible in any engine, stable under re-partitioning — never
  // sample() with a seed, whose output depends on partitioning.
  private def qStratified(s: SparkSession, dir: String): DataFrame = {
    val bucket = md5Bucket(col("doc_id"), 100)
    val rate = when(col("lang") === "en", 50).otherwise(90) // keep 50% en, 90% rest
    t(s, dir, "documents")
      .filter(bucket < rate)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"))
      .orderBy("lang")
  }

  private val qStratifiedSql =
    """SELECT lang, count(*) AS n_sampled
       FROM (SELECT lang,
               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 100 AS b
             FROM documents)
       WHERE b < CASE WHEN lang = 'en' THEN 50 ELSE 90 END
       GROUP BY lang ORDER BY lang"""

  // -- CDC upsert apply --------------------------------------------------------------
  // The warehouse-side materialization of the reference's incremental sync:
  // a change batch (new version per key) applied last-write-wins over the
  // base snapshot in one shuffle (Upsert operator). Changes derived
  // deterministically so DuckDB can rebuild them.
  private def qUpsert(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"))
    val changes = base.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") + 1000).as("o_totalprice"),
        (col("o_orderdate") + expr("INTERVAL 1 DAY")).as("o_orderdate"))
    // the SCALE-path formulation is the gate-checked one: broadcast key
    // split, base never shuffled (mergeLargeBase; orders keys are unique
    // and non-null, satisfying its precondition). Same oracle as the
    // window formulation — UpsertSpec asserts their equality directly.
    graft.operators.Upsert.mergeLargeBase(base, changes, Seq("o_orderkey"), "o_orderdate")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("sum_price"))
      .orderBy("o_orderstatus")
  }

  private val qUpsertSql =
    """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders),
       changes AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                          o_totalprice + 1000 AS o_totalprice,
                          o_orderdate + INTERVAL 1 DAY AS o_orderdate
                   FROM base WHERE o_orderkey % 10 = 0),
       u AS (SELECT * FROM (
               SELECT *, row_number() OVER (PARTITION BY o_orderkey
                 ORDER BY o_orderdate DESC, src DESC) AS rn
               FROM (SELECT *, 0 AS src FROM base
                     UNION ALL SELECT *, 1 AS src FROM changes))
             WHERE rn = 1)
       SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
       FROM u GROUP BY 1 ORDER BY 1"""

  // -- overlapping token-window chunking ------------------------------------------
  // Long documents → fixed-size training chunks with overlap (context-window
  // prep). Pure per-row array work then ONE explode — no shuffle, no state;
  // chunk boundaries are a deterministic function of the token index, so
  // the output is stable under any partitioning. chunk=50 tokens,
  // stride=40 (10-token overlap); a trailing remainder shorter than the
  // overlap is absorbed by the previous chunk (no 1-token fragments).
  private def qChunk(s: SparkSession, dir: String): DataFrame = {
    val chunk = 50
    val stride = 40
    val toks = split(col("text"), " ")
    val n = size(toks)
    // number of chunks: 1 + ceil(max(0, n - chunk) / stride)
    val nChunks = lit(1) + ceil(greatest(n - chunk, lit(0)).cast("double") / stride).cast("int")
    t(s, dir, "documents")
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), nChunks - 1),
          i => concat_ws(" ", slice(toks, i * stride + 1, lit(chunk))))).as(Seq("chunk_idx", "chunk_text")))
      .withColumn("n_chunk_tokens", size(split(col("chunk_text"), " ")))
      .orderBy("doc_id", "chunk_idx")
  }

  private val qChunkSql =
    """WITH d AS (SELECT doc_id, string_split(text,' ') AS tk FROM documents),
       c AS (SELECT doc_id, tk,
               1 + CAST(ceil(greatest(len(tk) - 50, 0) / 40.0) AS INT) AS n_chunks FROM d),
       e AS (SELECT doc_id, tk, unnest(range(0, n_chunks)) AS chunk_idx FROM c)
       SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         array_to_string(list_slice(tk, chunk_idx*40 + 1, chunk_idx*40 + 50), ' ') AS chunk_text,
         CAST(len(list_slice(tk, chunk_idx*40 + 1, chunk_idx*40 + 50)) AS INT) AS n_chunk_tokens
       FROM e ORDER BY doc_id, chunk_idx"""

  // -- per-source quota cap (RefinedWeb/CCNet-style per-domain limits) ---------------
  // Cap every source at N docs, chosen deterministically by md5 order (a
  // pseudo-random but reproducible pick — never orderBy(rand())). One
  // shuffle on source; at scale the per-source top-N is a bounded-heap
  // window, and a pathologically hot domain is exactly what the cap bounds.
  private def qSourceCap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    t(s, dir, "documents")
      .withColumn("pick", row_number().over(w))
      .filter(col("pick") <= 10)
      .select(col("source"), col("pick"), col("doc_id"))
      .orderBy("source", "pick")
  }

  private val qSourceCapSql =
    """SELECT source, CAST(pick AS INT) AS pick, doc_id FROM (
         SELECT source, doc_id,
           row_number() OVER (PARTITION BY source
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick
         FROM documents)
       WHERE pick <= 10 ORDER BY source, pick"""

  // -- PII / pattern scrubbing ------------------------------------------------------
  // Redaction over the events payload (the one column in this corpus with
  // digit content); per-row redacted text + match count, byte-compared
  // against DuckDB's regexp engine. Pure codegen map — runs at scan speed.
  private def qPiiScrub(s: SparkSession, dir: String): DataFrame =
    graft.operators.Scrub.redact(t(s, dir, "events"), "props",
      rules = Seq(graft.operators.Scrub.digitRun))
      .select(col("event_id"), col("props_redacted"), col("n_redactions"))
      .orderBy("event_id")

  private val qPiiScrubSql =
    """SELECT event_id,
         regexp_replace(props, '[0-9]{2,}', '[NUM]', 'g') AS props_redacted,
         CAST(len(regexp_extract_all(props, '[0-9]{2,}')) AS INT) AS n_redactions
       FROM events ORDER BY event_id"""

  // -- mixture resampling toward target language shares ------------------------------
  // Dolma-style mixing: given target corpus shares per language, derive the
  // per-language keep rate min(1, target_share·N / n_lang) and apply it with
  // the deterministic md5 bucket (downsampling only — upsampling is a
  // repeat-factor join, out of scope here). The rate table is one tiny
  // aggregate broadcast back over the corpus: one aggregation pass + one
  // map-side filter, partitioning-stable like every sampler in this pack.
  // The keep rule is PURE INTEGER math on both sides: bucket/10000 <
  // min(1, (s_pct/100)·N/n)  ⟺  bucket·n < s_pct·N·100 (the min(1,·) falls
  // out since bucket ≤ 9999). A float formulation put rate·10000 exactly ON
  // an integer boundary for one language (0.15·500/80 → 9375.0) where a
  // 1-ulp cross-engine product difference would shift a whole md5 bucket.
  private def qMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sPct = when(col("lang") === "en", 30L)
      .when(col("lang") === "zh", 25L)
      .otherwise(15L)
    val wAll = Window.partitionBy()
    val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
      .withColumn("s_pct", sPct)
      .withColumn("n_total", sum(col("n_before")).over(wAll))
    val bucket = md5Bucket(col("doc_id"), 10000).cast("long")
    docs.join(broadcast(rates), "lang")
      .filter(bucket * col("n_before") < col("s_pct") * col("n_total") * 100L)
      .groupBy(col("lang"), col("n_before"))
      .agg(count(lit(1)).as("n_sampled"))
      .select(col("lang"), col("n_before"), col("n_sampled"))
      .orderBy("lang")
  }

  private val qMixtureSql =
    """WITH rates AS (
         SELECT lang, count(*) AS n_before,
           CASE WHEN lang = 'en' THEN 30 WHEN lang = 'zh' THEN 25 ELSE 15 END AS s_pct,
           sum(count(*)) OVER () AS n_total
         FROM documents GROUP BY lang)
       SELECT d.lang, r.n_before, count(*) AS n_sampled
       FROM documents d JOIN rates r ON d.lang = r.lang
       WHERE (CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INT) % 10000)
             * r.n_before < r.s_pct * r.n_total * 100
       GROUP BY d.lang, r.n_before ORDER BY d.lang"""

  // -- unified repeat-factor resampling (up- AND down-sampling) -----------------------
  // qMixture above only downsamples (keep rate ≤ 1). The general mixture
  // primitive gives every doc an integer repeat count: target per-lang count
  // T = s_pct·N/100 spread over n docs → each doc repeats q = ⌊T/n⌋ times
  // plus one extra for the deterministic md5-bucket fraction of docs that
  // covers the remainder — so langs above target thin out (q=0, bucket
  // decides survival) and langs below target multiply (q≥1). Pure integer
  // comparison (bucket·100·n < rem·10⁴ where rem = (s_pct·N) mod (100·n)),
  // same boundary-safety argument as qMixture. The repeat materializes as
  // explode(sequence(1, k)) — a map-side flatMap, no shuffle, no join
  // against a repeat table; per-row fanout is bounded by ⌈T/n⌉, and the
  // oracle sums k in closed form (the exploded count equals the sum by
  // construction, so the gate also pins the explode arithmetic).
  private def qMixtureUpsample(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val sPct = when(col("lang") === "en", 20L)
      .when(col("lang") === "zh", 30L)
      .otherwise(25L)
    val wAll = Window.partitionBy()
    val rates = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_before"))
      .withColumn("s_pct", sPct)
      .withColumn("n_total", sum(col("n_before")).over(wAll))
    val bucket = md5Bucket(col("doc_id"), 10000).cast("long")
    val num = col("s_pct") * col("n_total")  // = 100·T (T = target per-lang count)
    val div = lit(100L) * col("n_before")
    val rem = num % div                      // exact (Remainder is integer-preserving)
    // ⌊num/div⌋ = (num - rem)/div: the numerator is exactly divisible, and
    // double division of exactly-divisible longs ≪ 2^53 is exact — Spark's
    // `/` on longs is double division, so the quotient is derived from the
    // exact remainder rather than trusted to floating floor
    val q = ((num - rem) / div).cast("long")
    val k = q + when(bucket * div < rem * 10000L, 1L).otherwise(0L)
    docs.join(broadcast(rates), "lang")
      .withColumn("k", k)
      .filter(col("k") > 0)
      .select(col("lang"), col("n_before"), explode(sequence(lit(1L), col("k"))).as("rep"))
      .groupBy(col("lang"), col("n_before"))
      .agg(count(lit(1)).as("n_after"))
      .orderBy("lang")
  }

  private val qMixtureUpsampleSql =
    """WITH rates AS (
         SELECT lang, count(*) AS n_before,
           CASE WHEN lang = 'en' THEN 20 WHEN lang = 'zh' THEN 30 ELSE 25 END AS s_pct,
           sum(count(*)) OVER () AS n_total
         FROM documents GROUP BY lang),
       j AS (SELECT d.lang, r.n_before, r.s_pct, r.n_total,
               CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)) AS INT) % 10000 AS b
             FROM documents d JOIN rates r ON d.lang = r.lang),
       rep AS (SELECT lang, n_before,
                 (s_pct * n_total) // (100 * n_before)
                 + CASE WHEN b * 100 * n_before
                        < ((s_pct * n_total) % (100 * n_before)) * 10000
                   THEN 1 ELSE 0 END AS k
               FROM j)
       SELECT lang, n_before, CAST(sum(k) AS BIGINT) AS n_after
       FROM rep WHERE k > 0 GROUP BY lang, n_before ORDER BY lang"""

  // -- curriculum schedule (quality-phased training order) ----------------------------
  // Curriculum training feeds cleaner data first. Phases are FIXED integer
  // quality boundaries (distinct-token permil ≥ 900 / 800 / 650 / rest) —
  // a pure map, no global sort or quantile pass: at 100 TB a global ntile
  // would serialize the corpus through one sort, while fixed boundaries
  // (chosen once from a profile of the distribution) stream. Output is the
  // per-phase schedule: doc and token budgets per phase per lang.
  private def qCurriculum(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val permil = least(lit(1000), (lit(1000) * size(array_distinct(toks))) / size(toks))
    val phase = when(permil >= 900, 0).when(permil >= 800, 1)
      .when(permil >= 650, 2).otherwise(3)
    t(s, dir, "documents")
      .select(col("lang"), phase.as("phase"), size(toks).as("nt"))
      .groupBy(col("phase"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("sum_tokens"))
      .orderBy("phase", "lang")
  }

  private val qCurriculumSql =
    """WITH d AS (SELECT lang,
         least(1000, (1000 * len(list_distinct(string_split(text, ' '))))
                     // len(string_split(text, ' '))) AS permil,
         len(string_split(text, ' ')) AS nt
       FROM documents)
       SELECT CASE WHEN permil >= 900 THEN 0 WHEN permil >= 800 THEN 1
                   WHEN permil >= 650 THEN 2 ELSE 3 END AS phase,
              lang, count(*) AS n_docs, CAST(sum(nt) AS BIGINT) AS sum_tokens
       FROM d GROUP BY 1, 2 ORDER BY phase, lang"""

  // -- quality-weighted soft sampling -------------------------------------------------
  // DCLM/FineWeb-style soft filtering: instead of a hard keep/drop gate,
  // each doc's keep PROBABILITY is its quality signal — here the distinct-
  // token ratio as integer permil — applied via the md5 bucket. High-quality
  // docs almost always survive, low-quality docs are downweighted but not
  // erased (preserving distribution tails). Pure integer comparison
  // (bucket < permil), pure map, partitioning-stable.
  private def qSoftSample(s: SparkSession, dir: String): DataFrame = {
    val toks = split(col("text"), " ")
    val permil = least(lit(1000), (lit(1000) * size(array_distinct(toks))) / size(toks))
      .cast("int")
    val bucket = md5Bucket(col("doc_id"), 1000)
    t(s, dir, "documents")
      .withColumn("kept", (bucket < permil).cast("int"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_before"), sum(col("kept")).as("n_kept"))
      .orderBy("lang")
  }

  private val qSoftSampleSql =
    """SELECT lang, count(*) AS n_before,
         CAST(sum(CASE WHEN
           CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT) % 1000
           < least(1000, (1000 * len(list_distinct(string_split(text, ' '))))
                         // len(string_split(text, ' ')))
         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       FROM documents GROUP BY lang ORDER BY lang"""

  // -- duplicate-cluster-atomic train/test split ------------------------------------
  // The naive hash split above (pipeline_split) leaks: two near-duplicate
  // documents can land in train and test, so the eval set contains
  // lightly-edited copies of training data. The leakage-safe split assigns
  // the WHOLE duplicate cluster by hashing its representative id — every
  // member inherits the cluster's split. Composed from the library's own
  // near-dup machinery (minHashDuplicates → clusterRepresentatives), so the
  // cluster structure is the same one the dedup gates verify; the split
  // itself stays the pack's pure-map md5-bucket recipe, applied to `rep`
  // instead of the doc's own id. n_naive_leaks counts the docs the naive
  // split would have placed outside their cluster's split — the measured
  // size of the leak this operator closes (0 for singletons by definition).
  // Scale shape: pairs/closure cost is the dedup pipeline's (banded LSH,
  // bounded union-find); the split assignment adds one broadcast-joined map
  // pass — the corpus never shuffles for the split itself.
  private def qClusterSplit(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minHashDuplicates(docs,
      id = col("doc_id"), text = col("text"), shingleWidth = 3, threshold = 0.8)
    def splitOf(c: org.apache.spark.sql.Column) = {
      val b = md5Bucket(c, 10)
      when(b < 8, "train").when(b === 8, "valid").otherwise("test")
    }
    Dedup.clusterRepresentatives(pairs, docs, "doc_id")
      .withColumn("split", splitOf(col("rep")))
      .withColumn("leak", (splitOf(col("id")) =!= col("split")).cast("long"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("rep")).as("n_clusters"),
        sum(col("leak")).as("n_naive_leaks"))
      .orderBy("split")
  }

  // oracle: the dedup_clusters recursive-CTE closure (exhaustive Jaccard
  // pairs, min reachable id), then the same md5-bucket split of rep vs id
  private val qClusterSplitSql =
    """WITH RECURSIVE d AS (
         SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
                i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
         FROM documents),
       toks AS (SELECT doc_id, unnest(sh) AS tok FROM d),
       sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                 FROM toks a JOIN toks b ON a.tok=b.tok AND a.doc_id < b.doc_id GROUP BY 1,2),
       pairs AS (
         SELECT id_a, id_b FROM inter
         JOIN sizes sa ON id_a=sa.doc_id JOIN sizes sb ON id_b=sb.doc_id
         WHERE i*1.0/(sa.sz+sb.sz-i) >= 0.8),
       edges AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
       walk(id, lbl) AS (
         SELECT doc_id, doc_id FROM documents
         UNION
         SELECT e.id_b, w.lbl FROM walk w JOIN edges e ON e.id_a = w.id),
       reps AS (SELECT id, min(lbl) AS rep FROM walk GROUP BY id),
       lab AS (SELECT id, rep,
                 CAST(('0x' || substring(md5(CAST(rep AS VARCHAR)), 1, 4)) AS INT) % 10 AS br,
                 CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 4)) AS INT) % 10 AS bi
               FROM reps)
       SELECT CASE WHEN br < 8 THEN 'train' WHEN br = 8 THEN 'valid' ELSE 'test' END AS split,
              count(*) AS n_docs, count(DISTINCT rep) AS n_clusters,
              CAST(sum(CASE WHEN
                (CASE WHEN br < 8 THEN 'train' WHEN br = 8 THEN 'valid' ELSE 'test' END) !=
                (CASE WHEN bi < 8 THEN 'train' WHEN bi = 8 THEN 'valid' ELSE 'test' END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_naive_leaks
       FROM lab GROUP BY 1 ORDER BY split"""

  // -- hard-negative mining (contrastive training) ------------------------------------
  // Retrieval/embedding training wants, per query, the highest-scoring
  // corpus items that are NOT positives: similar enough to be confused,
  // not so similar they're duplicates of the query (which would poison the
  // negative set with false negatives). Exclusion band reuses
  // dedup_semantic's 0.45 near-dup cosine threshold; below it, the top 5 by
  // cosine are the hard negatives. Same plan shape as knn_cosine_brute —
  // broadcast query set, map-only scoring over the corpus, one shuffle for
  // the per-query top-k window — so the corpus never shuffles and the
  // exclusion is a map-side filter BEFORE the window (the only rows ranked
  // are eligible negatives). Spark 4 plans the rn<=5 filter as a
  // WindowGroupLimit (verified in the executed plan): each input partition
  // keeps only its local top 5 per query before the exchange, so the
  // 10-query window partitions receive O(partitions·k) rows, not the
  // corpus — the property that keeps this shape viable at 100 TB.
  private def qHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queriesDf = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        norm2(col("embedding")).as("q_nrm"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    emb.select(col("vec_id").as("neighbor_id"), col("embedding"),
        norm2(col("embedding")).as("n_nrm"))
      .crossJoin(broadcast(queriesDf))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("n_nrm")))
      .filter(col("cos") < 0.45) // suspected positives / near-dups are not negatives
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), round(col("cos"), 4).as("cos"), col("rn"))
      .orderBy("query_id", "rn")
  }

  private val qHardNegativesSql =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, e.vec_id AS neighbor_id,
                list_cosine_similarity(q.q_emb::DOUBLE[], e.embedding::DOUBLE[]) AS cos
         FROM q JOIN embeddings e ON e.vec_id != q.query_id)
       SELECT query_id, neighbor_id, round(cos, 4) AS cos, CAST(rn AS INT) AS rn FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
         FROM scored WHERE cos < 0.45) WHERE rn <= 5 ORDER BY query_id, rn"""

  // -- DSIR importance resampling (Xie et al. 2023) ----------------------------------
  // Data Selection via Importance Resampling: score every raw document by
  // the log-likelihood ratio of two hashed-unigram bag-of-words models —
  // target domain (here: lang='en' docs) vs the raw pool — and keep the
  // top-k non-target docs, i.e. the raw docs that look most like the
  // target. Hashing tokens into 256 buckets (same md5-bucket convention as
  // the split/mixture gates) bounds the feature space regardless of
  // vocabulary size, which is the trick that makes DSIR run at corpus
  // scale: the two "models" are one 256-row table.
  //
  // Scale shape: the tokenize/explode map runs TWICE — once under the
  // bucket aggregation that builds both distributions at once (count +
  // conditional count in one pass) and once under the per-doc scoring join
  // (the uncached `toks` plan is evaluated by each consumer). Deliberate:
  // materializing the exploded token stream to avoid the second pass would
  // write MORE bytes than re-reading the raw documents, so two linear
  // scans of the input is the cheaper plan at any corpus size. The corpus
  // is never shuffled whole; the wide exchanges are the 256-key bucket agg
  // and the per-doc sum keyed by doc_id. Top-k is orderBy+limit
  // (distributed TakeOrdered), NOT a global window; the row_number runs on
  // the already-limited k rows.
  //
  // Determinism: per-token log-ratios are integer-quantized (floor(r·1e6 +
  // 0.5)) before summing — integer sums are accumulation-order-exact, the
  // same convention that keeps the CCNet-bucket gate stable across
  // engines; the reported weight is the exact integer sum scaled back.
  private def qDsir(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("b", md5Bucket(col("tok"), 256))
    val bc = toks.groupBy(col("b"))
      .agg(count(lit(1)).as("cs"),
        sum(when(col("lang") === "en", 1).otherwise(0)).as("ct"))
    val tot = bc.agg(sum(col("cs")).cast("double").as("ns"),
      sum(col("ct")).cast("double").as("nt"))
    // add-one smoothing over the 256 buckets so a bucket absent from the
    // target keeps a finite ratio
    val lr = bc.crossJoin(broadcast(tot))
      .select(col("b"),
        (log((col("ct") + lit(1)) / (col("nt") + lit(256))) -
          log((col("cs") + lit(1)) / (col("ns") + lit(256)))).as("r"))
    val per = toks.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(first(col("lang")).as("lang"),
        sum(floor(col("r") * lit(1e6) + lit(0.5)).cast("long")).as("qsum"))
    val topk = per.filter(col("lang") =!= "en")
      .orderBy(col("qsum").desc, col("doc_id"))
      .limit(20)
    topk
      .withColumn("rn", row_number().over(
        Window.orderBy(col("qsum").desc, col("doc_id")))) // 20 rows: bounded
      .select(col("doc_id"), col("lang"),
        round(col("qsum") / lit(1e6), 4).as("dsir_weight"), col("rn"))
      .orderBy("rn")
  }

  private val qDsirSql =
    """WITH tk AS (SELECT doc_id, lang, unnest(string_split(text,' ')) AS tok FROM documents),
       toks AS (SELECT doc_id, lang,
                  CAST(('0x'||substring(md5(tok),1,4)) AS INT)%256 AS b FROM tk),
       bc AS (SELECT b, count(*) AS cs,
                count(*) FILTER (WHERE lang='en') AS ct FROM toks GROUP BY 1),
       tot AS (SELECT sum(cs)*1.0 AS ns, sum(ct)*1.0 AS nt FROM bc),
       lr AS (SELECT b, ln((ct+1)/(nt+256)) - ln((cs+1)/(ns+256)) AS r
              FROM bc CROSS JOIN tot),
       per AS (SELECT t.doc_id, any_value(t.lang) AS lang,
                 sum(CAST(floor(r*1e6+0.5) AS BIGINT)) AS qsum
               FROM toks t JOIN lr USING (b) GROUP BY t.doc_id)
       SELECT doc_id, lang, round(qsum/1e6, 4) AS dsir_weight, CAST(rn AS INT) AS rn
       FROM (SELECT *, row_number() OVER (ORDER BY qsum DESC, doc_id) AS rn
             FROM per WHERE lang <> 'en')
       WHERE rn <= 20 ORDER BY rn"""

  // -- temperature-scaled language mixture (mT5 / XLM-R sampling) --------------------
  // Multinomial sampling with temperature: raw language shares p_l are
  // flattened to q_l ∝ p_l^(1/T) (here 1/T = 0.5, the mT5 default), which
  // boosts low-resource languages without discarding the head; the per-doc
  // keep rate min(1, q_l·M/n_l) targets an M-doc corpus. This emits the
  // RATE TABLE — applying it is the same deterministic md5-bucket map as
  // pipeline_mixture_sample. Plan: one tiny groupBy(lang) aggregate plus a
  // broadcast scalar; at 100 TB the per-language counts are the only pass
  // over the data and everything downstream is constant-size.
  private def qTemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val target = 300 // target corpus size M (docs at sf0.01 scale with the gate)
    val lc = t(s, dir, "documents").groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val tot = lc.agg(sum(col("n_docs")).cast("double").as("nn"),
      sum(sqrt(col("n_docs").cast("double"))).as("z"))
    lc.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"),
        round(col("n_docs") / col("nn"), 6).as("p_raw"),
        round(sqrt(col("n_docs").cast("double")) / col("z"), 6).as("p_temp"),
        round(least(lit(1.0),
          sqrt(col("n_docs").cast("double")) / col("z") * lit(target) / col("n_docs")),
          6).as("keep_rate"))
      .orderBy("lang")
  }

  private val qTemperatureMixSql =
    """WITH lc AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
       tot AS (SELECT sum(n)*1.0 AS nn, sum(sqrt(n*1.0)) AS z FROM lc)
       SELECT lang, n AS n_docs,
         round(n/nn, 6) AS p_raw,
         round(sqrt(n*1.0)/z, 6) AS p_temp,
         round(least(1.0, sqrt(n*1.0)/z * 300 / n), 6) AS keep_rate
       FROM lc CROSS JOIN tot ORDER BY lang"""

  // -- weighted reservoir sampling (Efraimidis–Spirakis A-ES) ------------------------
  // Deterministic weighted sampling WITHOUT replacement: each doc gets the
  // key ln(u)/w with u a hash-derived uniform in (0,1] and w its weight
  // (here n_chars — longer docs proportionally likelier); the sample is the
  // top-k by key. Equivalent to the classic u^(1/w) ordering in log space,
  // but u is md5-derived rather than RNG state, so the "random" sample is a
  // pure function of doc_id — re-runs, retries, and the DuckDB oracle all
  // draw the identical sample. Plan: a pure map over the corpus and one
  // bounded TakeOrdered — no shuffle proportional to data, the canonical
  // one-pass distributed reservoir at any corpus size.
  private def qWeightedReservoir(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        // (h+1)/2^60 ∈ (0,1]: int64→double rounding is IEEE-identical in
        // both engines; +1 keeps ln() off -inf at h=0
        ((graft.functions.TextFunctions.md5Hash60(col("doc_id").cast("string"))
          .cast("double") + 1.0) / lit(1.152921504606846976e18)).as("u"))
      .withColumn("key", log(col("u")) / col("n_chars"))
      .orderBy(col("key").desc, col("doc_id")).limit(20)
      .select(col("doc_id"), col("n_chars"), round(col("key") * 1e6, 4).as("samp_key_ppm"))

  private val qWeightedReservoirSql =
    """SELECT doc_id, n_chars, round(key * 1e6, 4) AS samp_key_ppm FROM (
         SELECT doc_id, n_chars,
           ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT::DOUBLE + 1)
              / 1152921504606846976.0) / n_chars AS key
         FROM documents)
       ORDER BY key DESC, doc_id LIMIT 20"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_weighted_reservoir" -> (qWeightedReservoir _),
    "pipeline_split" -> (qSplit _),
    "pipeline_source_cap" -> (qSourceCap _),
    "pipeline_pii_scrub" -> (qPiiScrub _),
    "pipeline_mixture_sample" -> (qMixture _),
    "pipeline_soft_sample" -> (qSoftSample _),
    "pipeline_chunk_docs" -> (qChunk _),
    "pipeline_pack_batches" -> (qPack _),
    "pipeline_pack_tokens" -> (qPackTokens _),
    "pipeline_contamination" -> (qContamination _),
    "pipeline_contamination_fuzzy" -> (qContaminationFuzzy _),
    "emb_quantize_int8" -> (qQuantize _),
    "pipeline_class_weights" -> (qClassWeights _),
    "pipeline_stratified_sample" -> (qStratified _),
    "pipeline_cluster_split" -> (qClusterSplit _),
    "pipeline_hard_negatives" -> (qHardNegatives _),
    "pipeline_mixture_upsample" -> (qMixtureUpsample _),
    "pipeline_curriculum" -> (qCurriculum _),
    "pipeline_dsir" -> (qDsir _),
    "pipeline_temperature_mix" -> (qTemperatureMix _),
    "q_upsert_cdc" -> (qUpsert _))

  override val oracles: Map[String, String] = Map(
    "pipeline_split" -> qSplitSql,
    "pipeline_source_cap" -> qSourceCapSql,
    "pipeline_pii_scrub" -> qPiiScrubSql,
    "pipeline_mixture_sample" -> qMixtureSql,
    "pipeline_soft_sample" -> qSoftSampleSql,
    "pipeline_chunk_docs" -> qChunkSql,
    "pipeline_pack_batches" -> qPackSql,
    "pipeline_pack_tokens" -> qPackTokensSql,
    "pipeline_contamination" -> qContaminationSql,
    "pipeline_contamination_fuzzy" -> qContaminationFuzzySql,
    "emb_quantize_int8" -> qQuantizeSql,
    "pipeline_class_weights" -> qClassWeightsSql,
    "pipeline_stratified_sample" -> qStratifiedSql,
    "pipeline_cluster_split" -> qClusterSplitSql,
    "pipeline_hard_negatives" -> qHardNegativesSql,
    "pipeline_mixture_upsample" -> qMixtureUpsampleSql,
    "pipeline_curriculum" -> qCurriculumSql,
    "pipeline_dsir" -> qDsirSql,
    "pipeline_temperature_mix" -> qTemperatureMixSql,
    "pipeline_weighted_reservoir" -> qWeightedReservoirSql,
    "q_upsert_cdc" -> qUpsertSql)
}
