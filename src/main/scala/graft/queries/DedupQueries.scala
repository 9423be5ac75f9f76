package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Deduplication over `documents` / `embeddings`: exact, keyed keep-first,
  * MinHash+LSH, exact n-gram Jaccard (inverted index), SimHash, and
  * embedding-cosine near-dup.
  *
  * Oracle strategy: the MinHash-LSH pipelines are verified against
  * brute-force Jaccard SQL in DuckDB — with 64 hashes / 32 bands of 2 rows,
  * LSH recall at the 0.8 threshold is 1-(1-0.64)^32 ≈ 1-4e-15, so the
  * verified-candidate output equals the exhaustive answer. SimHash's gate
  * uses the md5-based leaf hash ([[graft.functions.TextFunctions.md5Hash60]])
  * so the ENTIRE pipeline is re-derived bit-by-bit in SQL; the xxhash64 fast
  * path is the library default, covered by DedupSpec property tests.
  */
object DedupQueries extends QueryPack {

  // -- exact content dedup ------------------------------------------------------
  private def qExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(t(s, dir, "documents"), col("text"), col("doc_id"))
      .select(col("content_hash"), col("keep_id"), col("n_copies"))
      .orderBy("keep_id")

  private val qExactSql =
    """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
       FROM documents GROUP BY sha256(text) ORDER BY keep_id"""

  // -- keyed keep-first (reference PrimaryKey dedup, schema.go:5-12) -------------
  private def qKeepFirst(s: SparkSession, dir: String): DataFrame =
    Dedup.keepFirst(t(s, dir, "documents"), Seq("lang", "source"), Seq(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  private val qKeepFirstSql =
    """SELECT min(doc_id) AS doc_id, lang, source FROM documents
       GROUP BY lang, source ORDER BY doc_id"""

  // -- MinHash + LSH near-dup ------------------------------------------------------
  private def qMinHash(s: SparkSession, dir: String): DataFrame =
    Dedup.minHashDuplicates(t(s, dir, "documents"),
      id = col("doc_id"), text = col("text"), shingleWidth = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")

  private val minhashOracle =
    """WITH d AS (
         SELECT doc_id, list_distinct(list_transform(range(1, greatest(len(string_split(text,' '))-1, 1)),
                i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS sh
         FROM documents),
       toks AS (SELECT doc_id, unnest(sh) AS tok FROM d),
       sizes AS (SELECT doc_id, count(*) AS sz FROM toks GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
                 FROM toks a JOIN toks b ON a.tok=b.tok AND a.doc_id < b.doc_id GROUP BY 1,2)
       SELECT id_a, id_b, round(i*1.0/(sa.sz+sb.sz-i), 4) AS jaccard
       FROM inter JOIN sizes sa ON id_a=sa.doc_id JOIN sizes sb ON id_b=sb.doc_id
       WHERE i*1.0/(sa.sz+sb.sz-i) >= %THRESH%
       ORDER BY id_a, id_b"""

  private val qMinHashSql = minhashOracle.replace("%THRESH%", "0.8")

  // -- exact n-gram Jaccard via inverted index (no LSH; same answer, exhaustive) ----
  // Count-based: |∩| falls out of the token join's groupBy, never touching
  // full shingle arrays per pair. For THIS corpus (long docs, ~1k shingles,
  // high overlap) it beats the AllPairs prefix filter (Dedup.jaccardJoin) by
  // ~3× — hash-order prefixes prune poorly when sets are long and similar;
  // jaccardJoin is the right tool for short-set corpora instead.
  private def qNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    // persisted: consumed by both sides of the token join + the size lookup;
    // hashed shingles → the self-join shuffles longs, not 3-gram strings.
    // spread first: the few-MB single-file scan would otherwise serialize
    // all shingle hashing onto one core.
    val docs = Dedup.spread(t(s, dir, "documents"), col("doc_id"))
      .select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val toks = docs.select(col("doc_id"), explode(col("sh")).as("tok"))
    val sizes = docs.select(col("doc_id"), size(col("sh")).as("sz"))
    val inter = toks.as("a").join(toks.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("i"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard", col("i").cast("double") / (col("sz_a") + col("sz_b") - col("i")))
      .filter(col("jaccard") >= 0.7)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  private val qNgramJaccardSql = minhashOracle.replace("%THRESH%", "0.7")

  // -- incremental near-dup: fresh batch vs existing corpus --------------------------
  // The daily-pipeline shape: docs with id >= 450 play the "fresh batch",
  // the rest the standing corpus. The corpus is never self-joined — its
  // band table is the (persistable) index and the fresh bands broadcast
  // against it. Oracle = the exhaustive-Jaccard pair set restricted to
  // pairs touching the fresh range (recall argument identical to
  // dedup_minhash_lsh: same band family).
  private def qIncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.minHashIncremental(
      corpus = docs.filter(col("doc_id") < 450),
      fresh = docs.filter(col("doc_id") >= 450),
      id = col("doc_id"), text = col("text"), shingleWidth = 3, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  private val qIncrementalDedupSql = {
    val inner = minhashOracle.replace("%THRESH%", "0.8").replace("ORDER BY id_a, id_b", "")
    s"SELECT * FROM ($inner) WHERE id_a >= 450 OR id_b >= 450 ORDER BY id_a, id_b"
  }

  // -- duplicate clustering: minhash pairs → connected components → survivor ---------
  private def qClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minHashDuplicates(docs,
      id = col("doc_id"), text = col("text"), shingleWidth = 3, threshold = 0.8)
    Dedup.clusterRepresentatives(pairs, docs, "doc_id")
      .filter(col("id") =!= col("rep")) // only docs deduped away, keeps output small
      .orderBy("id")
  }

  // -- quality-max survivor policy ---------------------------------------------------
  // The curation policy real pipelines use instead of keep-first: within
  // each near-dup cluster keep the HIGHEST-QUALITY member (here n_chars,
  // ties to the lowest id). Same cluster machinery as dedup_clusters; the
  // survivor choice is one per-cluster argmax — a lexicographic struct max,
  // so it aggregates with map-side partials instead of a per-cluster sort.
  // Output: multi-member clusters only (rep, kept_id, n_members).
  private def qKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val pairs = Dedup.minHashDuplicates(docs,
      id = col("doc_id"), text = col("text"), shingleWidth = 3, threshold = 0.8)
    Dedup.clusterRepresentatives(pairs, docs, "doc_id")
      .join(docs.select(col("doc_id").as("id"), col("n_chars")), "id")
      .groupBy(col("rep"))
      .agg(count(lit(1)).as("n_members"),
        // max on (quality, -id): highest n_chars wins, ties to lowest id
        max(struct(col("n_chars").as("q"), (-col("id")).as("nid"))).as("best"))
      .filter(col("n_members") > 1)
      .select(col("rep"), (-col("best.nid")).as("kept_id"), col("n_members"))
      .orderBy("rep")
  }

  private val qKeepBestSql =
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
       labels AS (SELECT id, min(lbl) AS rep FROM walk GROUP BY id),
       scored AS (SELECT l.id, l.rep, doc.n_chars
                  FROM labels l JOIN documents doc ON doc.doc_id = l.id),
       ranked AS (SELECT rep, id, count(*) OVER (PARTITION BY rep) AS n_members,
                    row_number() OVER (PARTITION BY rep ORDER BY n_chars DESC, id) AS rn
                  FROM scored)
       SELECT rep, id AS kept_id, n_members FROM ranked
       WHERE rn = 1 AND n_members > 1 ORDER BY rep"""

  // oracle: same pair set (exhaustive Jaccard >= 0.8), transitive closure by
  // recursive reachability, min reachable id per node
  private val qClustersSql =
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
         SELECT e.id_b, w.lbl FROM walk w JOIN edges e ON e.id_a = w.id)
       SELECT id, min(lbl) AS rep FROM walk GROUP BY id
       HAVING id != min(lbl) ORDER BY id"""

  // -- SimHash near-dup --------------------------------------------------------------
  // Leaf token hash is md5Hash60 (SQL-re-derivable) so the WHOLE pipeline —
  // token hashing, 64 majority-vote bits, pigeonhole banding, in-bucket
  // Hamming — is exactly re-derived by the oracle below. The library default
  // stays xxhash64 (fast path, same operator, covered by DedupSpec).
  private def qSimHash(s: SparkSession, dir: String): DataFrame =
    Dedup.simHashDuplicates(t(s, dir, "documents"), col("doc_id"), col("text"), maxDist = 3,
      hasher = graft.functions.TextFunctions.md5Hash60, sigBits = 60)
      .orderBy("id_a", "id_b")

  // The exact SQL dual, generated bit-by-bit: per-token 60-bit md5-prefix
  // hashes; simhash bit b = majority vote (ties set, matching SimHash64's
  // `2*count >= n`); bits 60-63 are always 0 for 60-bit inputs on both
  // sides, so the 4 pigeonhole bands are 15 bits over the LIVE bit range
  // (sigBits=60 — 16-bit bands would waste 4 dead bits of top-band entropy
  // and triple the candidate volume at scale); pairwise Hamming via
  // bit_count(xor). All values stay positive (< 2^60), so shifts and masks
  // agree between engines' signed 64-bit lanes.
  private val qSimHashSql = {
    val bitCounts = (0 until 60)
      .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE 0 END) AS c$b").mkString(", ")
    val sigTerms = (0 until 60)
      .map(b => s"(CASE WHEN 2*c$b >= n THEN (1::BIGINT << $b) ELSE 0 END)").mkString(" + ")
    s"""WITH d AS (SELECT doc_id, list_transform(string_split(text,' '),
           t -> ('0x' || substr(md5(t), 1, 15))::BIGINT) AS th FROM documents),
       tok AS (SELECT doc_id, unnest(th) AS h FROM d),
       cnt AS (SELECT doc_id, count(*) AS n, $bitCounts FROM tok GROUP BY doc_id),
       sig AS (SELECT doc_id, $sigTerms AS s FROM cnt),
       bands AS (SELECT doc_id, s, b, (s >> (15*b)) & 32767 AS v
                 FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS b) bl),
       pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sa, b.s AS sb
                 FROM bands a JOIN bands b ON a.b = b.b AND a.v = b.v AND a.doc_id < b.doc_id)
       SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       FROM pairs WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b"""
  }

  // -- embedding-cosine near-dup -------------------------------------------------------
  // Exhaustive pairwise semantics (the 0.4 threshold is too weak for any LSH
  // family to prune with near-1 recall — see Dedup.cosineJoinBlocked's doc),
  // executed as the blocked stripe-pair EQUI-join: O(n·B) replication, one
  // shuffle on the stripe-pair key, bounded memory per task, and no
  // nested-loop/cartesian join anywhere in the plan (plan-shape asserted in
  // DedupSpec). High-threshold near-dup at 100 TB should use the LSH
  // candidate pipelines instead (ann_rhp_lsh / dedup_minhash_lsh).
  private def qEmbDup(s: SparkSession, dir: String): DataFrame =
    Dedup.cosineJoinBlocked(t(s, dir, "embeddings"),
      id = col("vec_id"), vec = col("embedding"), threshold = 0.4, blocks = 16)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")

  private val qEmbDupSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
       ORDER BY id_a, id_b"""

  // -- corpus-duplicated span fraction (windowed exact-substring dedup proxy) --------
  // Lee et al.-style: a doc whose 5-token windows mostly appear in other
  // docs is boilerplate/duplication; per-doc dup fraction + keep flag.
  // Window identity is the xxhash64 shingle hash on the Spark side and the
  // literal window string in DuckDB — identical counts up to 64-bit
  // collisions (the same argument as dedup_ngram_jaccard's intersection).
  private def qSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(t(s, dir, "documents"), col("doc_id"), col("text"),
      w = 5, keepBelow = 0.5)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  private val qSpansSql =
    """WITH d AS (SELECT doc_id, list_distinct(list_transform(
           range(1, greatest(len(string_split(text,' '))-3, 1)),
           i -> string_split(text,' ')[i]||' '||string_split(text,' ')[i+1]||' '||
                string_split(text,' ')[i+2]||' '||string_split(text,' ')[i+3]||' '||
                string_split(text,' ')[i+4])) AS wins FROM documents),
       w AS (SELECT doc_id, unnest(wins) AS win FROM d),
       cnt AS (SELECT win, count(*) AS nd FROM w GROUP BY 1)
       SELECT w.doc_id, count(*) AS n_windows,
         CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
         round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)*1.0/count(*), 4) AS dup_frac,
         round(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)*1.0/count(*), 4) < 0.5 AS keep
       FROM w JOIN cnt USING (win) GROUP BY w.doc_id ORDER BY doc_id"""

  // -- exact maximal duplicated-span runs (Lee et al. §4 span semantics) -------------
  // The positional upgrade of dedup_span_windows: adjacent corpus-duplicated
  // 5-token windows merge into maximal runs with token boundaries. Window
  // identity is the xxhash64 shingle hash on the Spark side and the literal
  // window string in DuckDB (same collision caveat as dedup_span_windows);
  // the run merge is pure integer gaps-and-islands, exactly re-derived.
  private def qSpanRuns(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpanRuns(t(s, dir, "documents"), col("doc_id"), col("text"), w = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id", "run_idx")

  private val qSpanRunsSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
       d AS (SELECT doc_id, list_transform(range(1, greatest(len(toks)-3, 1)),
               i -> array_to_string(list_slice(toks, i, i+4), ' ')) AS wins FROM t),
       w AS (SELECT doc_id, unnest(wins) AS win, generate_subscripts(wins, 1) - 1 AS pos FROM d),
       cnt AS (SELECT win, count(DISTINCT doc_id) AS nd FROM w GROUP BY 1),
       dp AS (SELECT DISTINCT doc_id, pos FROM w JOIN cnt USING (win) WHERE nd > 1),
       r AS (SELECT doc_id, pos,
               CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > 5
                 THEN 1 ELSE 0 END AS nw
             FROM dp),
       g AS (SELECT doc_id, pos,
               sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) + 1 AS run_idx FROM r)
       SELECT doc_id, CAST(run_idx AS BIGINT) AS run_idx, CAST(min(pos) AS INT) AS start_tok,
         CAST(max(pos) + 4 AS INT) AS end_tok, CAST(max(pos) + 5 - min(pos) AS INT) AS n_tokens
       FROM g GROUP BY doc_id, run_idx ORDER BY doc_id, run_idx"""

  // -- exact duplicated-span REMOVAL (Lee et al. §4 — the production cut) ------------
  // The op on top of dedup_span_runs' diagnostics: every maximal
  // corpus-duplicated run is cut out of the token stream and the cleaned
  // corpus re-emitted. The oracle re-derives the duplicated window
  // positions, expands each to its w-token coverage, and filters the
  // token list by position — the union of a run's windows is exactly the
  // run's [start_tok, end_tok] (gap ≤ w makes adjacent windows touch), so
  // the two formulations remove identical token sets.
  private def qSpanRemove(s: SparkSession, dir: String): DataFrame =
    Dedup.removeDuplicatedSpans(t(s, dir, "documents"), col("doc_id"), col("text"), w = 5)
      .withColumnRenamed("id", "doc_id")
      .orderBy("doc_id")

  private val qSpanRemoveSql =
    """WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
       d AS (SELECT doc_id, list_transform(range(1, greatest(len(toks)-3, 1)),
               i -> array_to_string(list_slice(toks, i, i+4), ' ')) AS wins FROM t),
       w AS (SELECT doc_id, unnest(wins) AS win, generate_subscripts(wins, 1) - 1 AS pos FROM d),
       cnt AS (SELECT win, count(DISTINCT doc_id) AS nd FROM w GROUP BY 1),
       dp AS (SELECT DISTINCT doc_id, pos FROM w JOIN cnt USING (win) WHERE nd > 1),
       cov AS (SELECT DISTINCT doc_id, pos + o AS cut
               FROM dp CROSS JOIN (SELECT unnest([0,1,2,3,4]) AS o)),
       covl AS (SELECT doc_id, list(cut) AS cuts FROM cov GROUP BY 1)
       SELECT t.doc_id,
         coalesce(array_to_string(list_filter(list_transform(range(1, len(toks)+1),
           i -> CASE WHEN cl.cuts IS NOT NULL AND list_contains(cl.cuts, i - 1)
                THEN NULL ELSE toks[i] END), x -> x IS NOT NULL), ' '), '') AS clean_text,
         CAST(coalesce(len(cl.cuts), 0) AS INT) AS n_tokens_removed
       FROM t LEFT JOIN covl cl USING (doc_id)
       ORDER BY doc_id"""

  // -- SemDeDup-style semantic dedup: IVF cells, within-cell cosine pairs ------------
  // Deterministic seeded centroids (first k corpus rows), so the oracle
  // re-derives cell assignment identically. k SCALES WITH THE CORPUS —
  // max(8, ⌈n/250⌉) cells, the SemDeDup paper's bounded-cell-occupancy
  // convention: the within-cell pass is exhaustive, so a FIXED k makes it
  // Θ(n²/k) — measured, not hypothetical: the r7 100× tier caught this
  // query at 61.7× growth for 10× data with k=8 before the scaling. With
  // n/k capped at ~250 the within-cell pairs stay ≤ ~31k per cell and the
  // total is linear in n. Gate values at the driver SFs are unchanged
  // (n ≤ 2000 there → k = 8). The 0.45 threshold fits this synthetic
  // corpus (within-cell cos maxes at ~0.49); production near-dup runs
  // ≥ 0.9 — the operator is threshold-agnostic.
  private def qSemantic(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val k = math.max(8L, math.ceil(emb.count() / 250.0).toLong)
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    Dedup.semanticDuplicates(emb, col("vec_id"), col("embedding"), cents, threshold = 0.45)
      .select(col("cell"), col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy("id_a", "id_b")
  }

  private val qSemanticSql =
    """WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
         WHERE vec_id < (SELECT greatest(8, CAST(ceil(count(*) / 250.0) AS BIGINT))
                         FROM embeddings)),
       assigned AS (
         -- argmin on the exact squared sum, matching Spark's l2sq ordering
         SELECT vec_id, embedding, cent_id FROM (
           SELECT e.vec_id, e.embedding, c.cent_id,
             row_number() OVER (PARTITION BY e.vec_id
               ORDER BY list_sum(list_transform(range(1, 65),
                 i -> (e.embedding[i]::DOUBLE - c.cent[i]::DOUBLE)
                    * (e.embedding[i]::DOUBLE - c.cent[i]::DOUBLE))) ASC, c.cent_id) AS arn
           FROM embeddings e CROSS JOIN cents c) WHERE arn = 1)
       SELECT a.cent_id AS cell, a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
       FROM assigned a JOIN assigned b ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
       WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.45
       ORDER BY id_a, id_b"""

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (qExact _),
    "dedup_keep_first" -> (qKeepFirst _),
    "dedup_minhash_lsh" -> (qMinHash _),
    "dedup_incremental" -> (qIncrementalDedup _),
    "dedup_ngram_jaccard" -> (qNgramJaccard _),
    "dedup_clusters" -> (qClusters _),
    "dedup_keep_best" -> (qKeepBest _),
    "dedup_simhash" -> (qSimHash _),
    "dedup_span_windows" -> (qSpans _),
    "dedup_span_runs" -> (qSpanRuns _),
    "dedup_span_remove" -> (qSpanRemove _),
    "dedup_semantic" -> (qSemantic _),
    "dedup_embedding_cosine" -> (qEmbDup _))

  override val oracles: Map[String, String] = Map(
    "dedup_exact" -> qExactSql,
    "dedup_keep_first" -> qKeepFirstSql,
    "dedup_minhash_lsh" -> qMinHashSql,
    "dedup_incremental" -> qIncrementalDedupSql,
    "dedup_ngram_jaccard" -> qNgramJaccardSql,
    "dedup_clusters" -> qClustersSql,
    "dedup_keep_best" -> qKeepBestSql,
    "dedup_simhash" -> qSimHashSql,
    "dedup_span_windows" -> qSpansSql,
    "dedup_span_runs" -> qSpanRunsSql,
    "dedup_span_remove" -> qSpanRemoveSql,
    "dedup_semantic" -> qSemanticSql,
    "dedup_embedding_cosine" -> qEmbDupSql)
}
