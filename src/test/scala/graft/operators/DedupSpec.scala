package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup operator unit tests: shingle guards, LSH candidate recall vs exact
  * Jaccard, SimHash banding (SURVEY §5 item 1).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
    (3L, "completely different text about spark engines and scala"),
    (4L, "the quick brown fox jumps over the lazy dog today"),   // exact dup of 1
    (5L, "short"))                                               // < w tokens
    .toDF("doc_id", "text")

  test("shingles: empty array (not [1,0] sequence artifact) for short docs") {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(col("doc_id") === 5).select(size(col("sh"))).as[Int].head()
    assert(sh == 0)
  }

  test("ShingleHashes == xxhash64 of string shingles, bit-exact (codegen byte-scan parity)") {
    val viaStrings = docs.select(col("doc_id"),
      array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s))).as("h"))
    val viaBytes = docs.select(col("doc_id"), Dedup.shingleHashes(col("text"), 3).as("h"))
    val a = viaStrings.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    val b = viaBytes.orderBy("doc_id").as[(Long, Seq[Long])].collect().toSeq
    assert(a == b)
    // multi-space text keeps parity too (empty tokens in both formulations)
    val weird = Seq((9L, "a  b c  d e")).toDF("doc_id", "text")
    val x = weird.select(array_distinct(transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)))).as[Seq[Long]].head()
    val y = weird.select(Dedup.shingleHashes(col("text"), 3)).as[Seq[Long]].head()
    assert(x == y)
  }

  test("exact dedup keeps min id per content") {
    val out = Dedup.exact(docs, col("text"), col("doc_id"))
      .orderBy("keep_id").select("keep_id", "n_copies").as[(Long, Long)].collect().toList
    assert(out == List((1L, 2L), (2L, 1L), (3L, 1L), (5L, 1L)))
  }

  test("minhash LSH finds exact + near duplicates above threshold") {
    val pairs = Dedup.minHashDuplicates(docs, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // exact dup, jaccard 1.0
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // near-dups
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // unrelated doc clean
  }

  test("minhash signature is deterministic across evaluations") {
    val sig = docs.where(col("doc_id") === 1)
      .select(Dedup.minHashSignature(Dedup.shingles(col("text"), 3), 16, 42L).as("s"))
      .as[Seq[Long]].head()
    val sig2 = docs.where(col("doc_id") === 1)
      .select(Dedup.minHashSignature(Dedup.shingles(col("text"), 3), 16, 42L).as("s"))
      .as[Seq[Long]].head()
    assert(sig == sig2 && sig.size == 16)
  }

  test("simhash: identical docs distance 0; near-dups within band reach") {
    val out = Dedup.simHashDuplicates(docs, col("doc_id"), col("text"), maxDist = 16)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
    val m = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(m((1L, 4L)) == 0)        // exact dup → identical simhash
    assert(m.get((1L, 2L)).exists(_ <= 16)) // one-token change → small distance
  }

  test("clusterRepresentatives: min-label over components, chain + isolated nodes") {
    val ids = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    // components: {1,2,3} via chain 1-2, 2-3; {5,6}; isolated 4, 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.clusterRepresentatives(pairs, ids, "doc_id")
      .orderBy("id").as[(Long, Long)].collect().toList
    assert(out == List(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
    // distributed label-propagation fallback (driverEdgeLimit=0) agrees
    val dist = Dedup.clusterRepresentatives(pairs, ids, "doc_id", driverEdgeLimit = 0)
      .orderBy("id").as[(Long, Long)].collect().toList
    assert(dist == out)
  }

  test("clusterRepresentatives fallback: superseded label generations are unpersisted") {
    // a 12-node chain needs several propagation rounds (diameter ~11,
    // halved per round by min-label adoption) — enough generations that a
    // leak would be visible in the persistent-RDD census
    val ids = (1L to 12L).map(Tuple1(_)).toDF("doc_id")
    val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.size
    val out = Dedup.clusterRepresentatives(pairs, ids, "doc_id", driverEdgeLimit = 0)
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L)) // one component, min label 1
    // only `edges` + the FINAL labels generation may remain cached; every
    // superseded generation must be gone
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2, s"leaked cached generations: $before -> $after")
    spark.catalog.clearCache()
  }

  test("jaccardJoin (AllPairs prefix filter) == brute-force pairwise Jaccard") {
    val out = Dedup.jaccardJoin(docs, col("doc_id"), col("text"), 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // brute force over all pairs with string shingles
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    val expected = (for {
      a <- sh.keys; b <- sh.keys if a < b
      inter = sh(a).toSet.intersect(sh(b).toSet).size
      j = inter.toDouble / sh(a).toSet.union(sh(b).toSet).size
      if j >= 0.5
    } yield (a, b) -> j).toMap
    assert(out == expected, s"got $out expected $expected")
    assert(expected.nonEmpty) // non-vacuous: the dup pairs must be found
  }

  test("jaccardJoin keeps exact-threshold pairs whose product hits double rounding (prefix epsilon)") {
    // 25 * 0.28 = 7.000000000000001 in a double: an un-relaxed
    // ceil(|a|·t) computes 8 instead of 7, shortening a's prefix to 18 —
    // and a subset doc holding exactly a's 7 LARGEST-hash shingles
    // (jaccard exactly 7/25 = 0.28) then shares no prefix token and is
    // silently dropped. Width-1 shingles make the adversarial subset
    // constructible: rank a's words by their shingle hash and take the
    // top 7.
    val words = (1 to 25).map(i => s"w$i")
    val wordDocs = words.zipWithIndex
      .map { case (w, i) => (100L + i, w) }.toDF("doc_id", "text")
    val ranked = wordDocs
      .select(col("text"), Dedup.shingleHashes(col("text"), 1)(0).as("h"))
      .as[(String, Long)].collect().sortBy(_._2).map(_._1)
    val docA = ranked.mkString(" ")               // all 25 words
    val docB = ranked.takeRight(7).mkString(" ")  // the 7 largest-hash words
    val pair = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val out = Dedup.jaccardJoin(pair, col("doc_id"), col("text"), 1, threshold = 0.28)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 0.28)),
      s"the exact-threshold subset pair must survive the prefix filter, got ${out.toSeq}")
  }

  test("clusterRepresentatives handles string ids (no driver fast path) and fails loudly on non-convergence") {
    // string ids: the long-cast driver union-find would NPE — the operator
    // must route them to the distributed propagation and keep the id type
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("id_a", "id_b")
    val ids = Seq("a", "b", "c", "d").toDF("doc_id")
    val reps = Dedup.clusterRepresentatives(pairs, ids, "doc_id")
      .as[(String, String)].collect().toMap
    assert(reps == Map("a" -> "a", "b" -> "a", "c" -> "a", "d" -> "d"))

    // a 6-hop chain under maxIter=2 cannot converge — wrong labels must
    // throw, not return silently-split clusters (forced onto the
    // distributed path: driverEdgeLimit=0)
    val chain = (1L until 8L).map(i => (i - 1, i)).toDF("id_a", "id_b")
    val chainIds = (0L until 8L).toDF("doc_id")
    val e = intercept[IllegalStateException] {
      Dedup.clusterRepresentatives(chain, chainIds, "doc_id",
        maxIter = 2, driverEdgeLimit = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("integral EDGES over string IDS route to the distributed path (ADVICE r14)") {
    // numeric-looking edges with a string-typed ids frame: the driver path's
    // final `id.cast(long) === id0` join WOULD match here ("1".cast(long)=1),
    // but string ids in general (uuids) null out and silently keep every doc
    // its own representative — the guard must consider the ids frame's type,
    // not only the edges', and take the type-generic distributed path
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val ids = Seq("1", "2", "3", "x-uuid").toDF("doc_id")
    val reps = Dedup.clusterRepresentatives(pairs, ids, "doc_id")
      .as[(String, String)].collect().toMap
    assert(reps == Map("1" -> "1", "2" -> "1", "3" -> "1", "x-uuid" -> "x-uuid"),
      s"string ids must cluster via the distributed path, got $reps")
    // and the rep column kept the caller's id type
    assert(Dedup.clusterRepresentatives(pairs, ids, "doc_id")
      .schema("rep").dataType == org.apache.spark.sql.types.StringType)
  }

  test("jaccardJoin with duplicate-heavy shingles still matches set-Jaccard brute force") {
    // Repeated n-grams: if the prefix were derived from the multiset size (or
    // the array sorted without dedup), low-hash duplicate shingles would crowd
    // distinct tokens out of the prefix and qualifying pairs would be missed.
    val dupDocs = Seq(
      (1L, "x y x y x y x y x y q r s t u"),   // shingle multiset dominated by x/y repeats
      (2L, "x y x y x y x y x y q r s t v"),   // near-dup of 1 (one tail token differs)
      (3L, "q r s t u q r s t u q r s t u"),   // shares the rare tail shingles of 1
      (4L, "totally unrelated words about nothing in particular here"))
      .toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.6, 0.8)) {
      val out = Dedup.jaccardJoin(dupDocs, col("doc_id"), col("text"), 3, threshold = t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
        .map(x => (x._1, x._2) -> x._3).toMap
      val sh = dupDocs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .as[(Long, Seq[String])].collect().toMap
      val expected = (for {
        a <- sh.keys; b <- sh.keys if a < b
        inter = sh(a).toSet.intersect(sh(b).toSet).size
        j = inter.toDouble / sh(a).toSet.union(sh(b).toSet).size
        if j >= t
      } yield (a, b) -> j).toMap
      assert(out == expected, s"threshold $t: got $out expected $expected")
    }
  }

  test("dedup operators leave no dead caches behind (zero caller cache contract)") {
    // Previously minHashDuplicates / duplicatedSpans / duplicatedSpanRuns /
    // jaccardJoin / minHashIncremental persisted intermediates and obliged
    // callers to spark.catalog.clearCache() — a leak in any long-lived
    // process. Now every operator either runs cache-free or eagerly
    // materializes its result and unpersists its intermediates before
    // returning: the only pinned storage after a call may be the
    // localCheckpoint behind the RETURNED frame itself (freed by the
    // ContextCleaner when the caller drops it), never an intermediate.
    spark.catalog.clearCache()
    val beforeIds = spark.sparkContext.getPersistentRDDs.keySet
    val results = Seq(
      Dedup.minHashDuplicates(docs, col("doc_id"), col("text"), 3, 0.5),
      Dedup.duplicatedSpans(docs, col("doc_id"), col("text"), 3, 0.5),
      Dedup.duplicatedSpanRuns(docs, col("doc_id"), col("text"), 3),
      Dedup.jaccardJoin(docs, col("doc_id"), col("text"), 3, 0.5),
      Dedup.minHashIncremental(docs.filter(col("doc_id") <= 3),
        docs.filter(col("doc_id") > 3), col("doc_id"), col("text"), 3, 0.5))
    results.foreach(_.count()) // consume fully
    val returnedCheckpoints = results.flatMap(_.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd.id)
      case _ => None
    }).toSet
    val leaked = spark.sparkContext.getPersistentRDDs.keySet --
      beforeIds -- returnedCheckpoints
    assert(leaked.isEmpty, s"operators leaked cached RDDs: $leaked")
  }

  test("cosineJoinBlocked: exact pairwise answer, no nested-loop join in the plan") {
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => (i, Array.fill(8)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "emb")
    val out = Dedup.cosineJoinBlocked(vecs, col("vec_id"), col("emb"), threshold = 0.2, blocks = 5)
    // plan shape: the stripe-pair decomposition must plan as equi-joins only
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop join in plan:\n$plan")
    val got = out.select("id_a", "id_b", "cos").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // brute force
    val local = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expected = (for {
      a <- local.keys; b <- local.keys if a < b
      c = cos(local(a), local(b)) if c >= 0.2
    } yield (a, b) -> c).toMap
    assert(got.keySet == expected.keySet, s"pair sets differ: got ${got.keySet} expected ${expected.keySet}")
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9) }
    assert(expected.nonEmpty)
  }

  test("minHashIncremental == full-corpus run restricted to pairs touching the fresh batch") {
    val all = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about spark engines and scala"),
      (4L, "the quick brown fox jumps over the lazy dog today"),
      (5L, "completely different text about spark engines and rust"),
      (6L, "yet another unrelated document mentioning nothing shared"))
      .toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") <= 3)
    val fresh = all.filter(col("doc_id") > 3)
    val inc = Dedup.minHashIncremental(corpus, fresh, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minHashDuplicates(all, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      .filter(p => p._1 > 3 || p._2 > 3)
    assert(inc == full, s"incremental $inc != full-restricted $full")
    assert(inc.exists(p => p._1 == 1L && p._2 == 4L)) // cross corpus/fresh dup found
    assert(inc.exists(p => p._1 == 3L && p._2 == 5L)) // near-dup across the boundary
    // pairs entirely inside the corpus must NOT be re-emitted
    assert(!inc.exists(p => p._1 <= 3 && p._2 <= 3))
  }

  test("minHashIncremental: re-ingested id supersedes its corpus version, no pair fan-out") {
    val corpus = Seq(
      (7L, "old totally different text nothing shared here at all whatsoever"),
      (8L, "the quick brown fox jumps over the lazy dog right now")).toDF("doc_id", "text")
    val fresh = Seq( // doc 7 was edited: it now duplicates corpus doc 8
      (7L, "the quick brown fox jumps over the lazy dog right now")).toDF("doc_id", "text")
    val out = Dedup.minHashIncremental(corpus, fresh, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(out.length == 1, s"exactly one (7,8) row expected, got ${out.toList}")
    val (a, b, j) = out.head
    assert((a, b) == (7L, 8L))
    assert(j == 1.0, s"jaccard must be computed against the NEW text (1.0), got $j")
  }

  test("maxBucket caps hot LSH buckets: boilerplate mega-cliques are skipped, not exploded") {
    // 6 identical boilerplate docs (every band bucket has width 6) + one
    // genuine near-dup pair elsewhere in the corpus
    val boiler = (10L to 15L).map(i => (i, "standard footer text repeated across the whole site every page"))
    val corpus = (boiler ++ Seq(
      (1L, "a unique document about spark plans and shuffles today"),
      (2L, "a unique document about spark plans and shuffles tonight"))).toDF("doc_id", "text")
    val capped = Dedup.minHashDuplicates(corpus, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5, maxBucket = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)))                    // calm buckets unaffected
    assert(!capped.exists(p => p._1 >= 10L && p._2 >= 10L)) // hot clique skipped
    val uncapped = Dedup.minHashDuplicates(corpus, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.count(p => p._1 >= 10L && p._2 >= 10L) == 15) // default keeps all 6C2 pairs
  }

  test("hot-bucket cap accounting: dropped buckets/pairs surface when the cap binds, zero when not") {
    // 6 identical boilerplate docs: all 32 bands collide into width-6
    // buckets, every one over a cap of 4 → 32 dropped buckets, each
    // forgoing C(6,2)=15 pairs. The near-dup pair (1,2) lives in calm
    // width-2 buckets and must not be counted.
    val boiler = (10L to 15L).map(i => (i, "standard footer text repeated across the whole site every page"))
    val corpus = (boiler ++ Seq(
      (1L, "a unique document about spark plans and shuffles today"),
      (2L, "a unique document about spark plans and shuffles tonight"))).toDF("doc_id", "text")
    val (_, binding) = Dedup.minHashDuplicatesAccounted(corpus, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5, maxBucket = 4)
    assert(binding == Some((32L, 32L * 15L)),
      s"cap binds on all 32 boilerplate band buckets: got $binding")
    val (_, finite) = Dedup.minHashDuplicatesAccounted(corpus, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5, maxBucket = 100)
    assert(finite == Some((0L, 0L)), s"finite unbinding cap must report zero drops: got $finite")
    val (_, off) = Dedup.minHashDuplicatesAccounted(corpus, col("doc_id"), col("text"),
      shingleWidth = 3, threshold = 0.5)
    assert(off.isEmpty, "no cap, no metric — nothing can silently drop")
  }

  test("hot-bucket cap accounting on the incremental path bounds FRESH-involving pairs only") {
    val corpus = (10L to 14L)
      .map(i => (i, "standard footer text repeated across the whole site every page"))
      .toDF("doc_id", "text")
    val fresh = Seq((20L, "standard footer text repeated across the whole site every page"))
      .toDF("doc_id", "text")
    val docsOf = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("doc_id").as("__id"), Dedup.shingleHashes(col("text"), 3).as("__sh"))
    val corpusDocs = docsOf(corpus)
    val bands = Dedup.bandTable(corpusDocs, "__id", "__sh", nHashes = 64, r = 2, seed = 42L)
    val (pairs, acct) = Dedup.minHashIncrementalIndexedAccounted(
      corpusDocs, bands, docsOf(fresh), threshold = 0.5, maxBucket = 4)
    // combined width 6 > 4 in every band: all buckets skipped → no pairs.
    // Only fresh-involving pairs were ever candidates here: wf·(w−wf) +
    // C(wf,2) = 1·5 + 0 = 5 per bucket — NOT the batch path's C(6,2)=15
    // (r10 ADVICE: the combined bound counted corpus×corpus pairs this path
    // can never generate).
    assert(pairs.isEmpty, "every bucket is hot; the capped incremental run yields no candidates")
    assert(acct == Some((32L, 32L * 5L)), s"32 hot buckets × 5 fresh-involving pairs: got $acct")
  }

  test("incremental cap accounting degenerates to the batch bound when everything is fresh") {
    // empty corpus: wf == w, so wf·(w−wf) + C(wf,2) == C(w,2) — the two
    // same-named metrics must agree on the batch-degenerate case
    val fresh = (10L to 15L)
      .map(i => (i, "standard footer text repeated across the whole site every page"))
      .toDF("doc_id", "text")
    val docsOf = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("doc_id").as("__id"), Dedup.shingleHashes(col("text"), 3).as("__sh"))
    val empty = docsOf(fresh).limit(0)
    val emptyBands = Dedup.bandTable(empty, "__id", "__sh", nHashes = 64, r = 2, seed = 42L)
    val (_, acct) = Dedup.minHashIncrementalIndexedAccounted(
      empty, emptyBands, docsOf(fresh), threshold = 0.5, maxBucket = 4)
    assert(acct == Some((32L, 32L * 15L)),
      s"all-fresh buckets of width 6 forgo C(6,2)=15 pairs each, matching the batch metric: got $acct")
  }

  test("cosineJoinBlocked: block-count edge cases (1 stripe, more stripes than vectors)") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 12L).map(i => (i, Array.fill(6)(rnd.nextFloat() * 2 - 1))).toDF("vec_id", "emb")
    val local = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expected = (for {
      a <- local.keys; b <- local.keys if a < b
      c = cos(local(a), local(b)) if c >= 0.1
    } yield (a, b)).toSet
    for (blocks <- Seq(1, 7, 64)) { // single stripe; odd count; stripes ≫ vectors
      val got = Dedup.cosineJoinBlocked(vecs, col("vec_id"), col("emb"), threshold = 0.1, blocks = blocks)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(got == expected, s"blocks=$blocks: got $got expected $expected")
    }
    assert(expected.nonEmpty)
  }

  test("cosineJoinBlocked stripes on a hash — non-numeric ids are not dropped") {
    val vecs = Seq(
      ("doc-a", Array(1f, 0f, 0f)),
      ("doc-b", Array(1f, 0f, 0f)),   // exact match of doc-a
      ("doc-c", Array(0f, 1f, 0f)))
      .toDF("vec_id", "emb")
    val out = Dedup.cosineJoinBlocked(vecs, col("vec_id"), col("emb"), threshold = 0.9, blocks = 2)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    assert(out == Set(("doc-a", "doc-b")))
  }

  test("duplicatedSpans: cross-doc windows flag docs, unique docs stay clean") {
    // docs 1 and 4 are identical (every window duplicated); doc 2 shares a
    // long prefix with them; doc 3 shares nothing; doc 5 has no window
    val out = Dedup.duplicatedSpans(docs, col("doc_id"), col("text"), w = 3, keepBelow = 0.5)
      .select("id", "n_windows", "n_dup", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(!out.contains(5L)) // below window width: no row
    assert(out(1L)._3 == out(1L)._2 && !out(1L)._4) // all windows duplicated → drop
    assert(out(4L)._3 == out(4L)._2 && !out(4L)._4)
    assert(out(3L)._3 == 0L && out(3L)._4) // unique doc → keep
    assert(out(2L)._3 > 0L && out(2L)._3 < out(2L)._2) // partial overlap
  }

  test("simHashDuplicates == brute-force Hamming pairs, incl. non-divisible band widths and sigBits=60") {
    val rnd = new scala.util.Random(7)
    val baseToks = Vector.fill(30)(rnd.alphanumeric.take(6).mkString)
    val docs = (0 until 40).map { i =>
      val t2 = (0 until rnd.nextInt(4)).foldLeft(baseToks)((v, _) =>
        v.updated(rnd.nextInt(v.size), rnd.alphanumeric.take(6).mkString))
      (i.toLong, t2.mkString(" "))
    }.toDF("doc_id", "text")
    // maxDist=2 → 3 bands over 64 bits (non-divisible: widths 22/21/21).
    // The old fixed 64/3=21 banding covered only bits 0..62 — a pair whose
    // third differing bit sat at bit 63 was silently missed.
    for ((hasher, sigBits) <- Seq(
        ((c: org.apache.spark.sql.Column) => xxhash64(c), 64),
        ((c: org.apache.spark.sql.Column) => graft.functions.TextFunctions.md5Hash60(c), 60));
        maxDist <- Seq(2, 3)) {
      val got = Dedup.simHashDuplicates(docs, col("doc_id"), col("text"), maxDist,
          hasher, sigBits)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val sigs = docs
        .select(col("doc_id"), Dedup.simHash64(Dedup.tokenHashes(col("text"), hasher)).as("s"))
        .as[(Long, Long)].collect()
      val want = (for {
        a <- sigs; b <- sigs
        if a._1 < b._1 && java.lang.Long.bitCount(a._2 ^ b._2) <= maxDist
      } yield (a._1, b._1)).toSet
      assert(got == want, s"hasherBits=$sigBits maxDist=$maxDist: $got vs $want")
      assert(want.nonEmpty, s"degenerate fixture at maxDist=$maxDist") // non-vacuous
    }
  }

  test("simHashDuplicates maxDist=0: single 64-bit band buckets by full signature, not bucket 0") {
    // (1L << 64) - 1 == 0 on the JVM — the single-band mask must be -1L, or
    // every signature collapses into one corpus-wide bucket (quadratic pair
    // explosion); output-wise: exact signature matches only
    val d = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"), // identical → sig equal
      (3L, "wholly different tokens here"), (4L, "and a fourth unrelated doc"))
      .toDF("doc_id", "text")
    val out = Dedup.simHashDuplicates(d, col("doc_id"), col("text"), maxDist = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
    // and the band values must actually distinguish signatures: docs 3/4
    // only reach the hamming check if they shared the (single) bucket — the
    // mask bug would put all 4 docs in one bucket; assert via plan-free
    // proxy: candidate pairs == output pairs here because all sigs differ
    intercept[IllegalArgumentException] {
      Dedup.simHashDuplicates(d, col("doc_id"), col("text"), maxDist = 65)
    }
  }

  test("assignCells: empty centroid table yields an empty frame, not null cells") {
    val vecs = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "v")
    val empty = Seq.empty[(Long, Array[Float])].toDF("cent_id", "cent")
    val out = Dedup.assignCells(vecs, col("vec_id"), col("v"), empty)
    assert(out.count() == 0)
  }

  test("duplicatedSpanRuns: maximal span boundaries, gap split, within-doc repeats don't count") {
    val d = Seq(
      // docs 10/11 share "a b c d e f" (tokens 0-5 of 10, 2-7 of 11) and
      // "s t u" (tokens 10-12 of 10, 12-14 of 11), separated by > w unique
      // tokens on each side → exactly two runs per doc
      (10L, "a b c d e f p1 q1 r1 z1 s t u"),
      (11L, "x y a b c d e f p2 q2 r2 z2 s t u"),
      // doc 12 repeats "m n o" twice WITHIN itself only → no duplicated runs
      (12L, "m n o k1 k2 k3 m n o"),
      (13L, "totally unrelated tokens here throughout"))
      .toDF("doc_id", "text")
    val out = Dedup.duplicatedSpanRuns(d, col("doc_id"), col("text"), w = 3)
      .select("id", "run_idx", "start_tok", "end_tok", "n_tokens")
      .as[(Long, Long, Int, Int, Int)].collect().toSet
    assert(out == Set(
      (10L, 1L, 0, 5, 6), (10L, 2L, 10, 12, 3),
      (11L, 1L, 2, 7, 6), (11L, 2L, 12, 14, 3)))
  }

  test("duplicatedSpanRuns: runs separated by a gap of exactly w merge; w+1 split") {
    // shared windows at starts 0 and 3 (w=3): gap == w → windows are
    // adjacent ([0,2] and [3,5]) → ONE merged run [0,5]
    val touching = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c q1 q2 d e f"))  // shares "a b c" (start 0) and "d e f"
      .toDF("doc_id", "text")
    val r1 = Dedup.duplicatedSpanRuns(touching, col("doc_id"), col("text"), w = 3)
      .filter(col("id") === 1L)
      .select("run_idx", "start_tok", "end_tok").as[(Long, Int, Int)].collect().toSet
    assert(r1 == Set((1L, 0, 5)))
    // doc 2's copies sit at starts 0 and 5: gap 5 > w → two runs
    val r2 = Dedup.duplicatedSpanRuns(touching, col("doc_id"), col("text"), w = 3)
      .filter(col("id") === 2L)
      .select("run_idx", "start_tok", "end_tok").as[(Long, Int, Int)].collect().toSet
    assert(r2 == Set((1L, 0, 2), (2L, 5, 7)))
  }

  test("removeDuplicatedSpans: cuts exactly the duplicated runs, passes clean docs through") {
    val d = Seq(
      // docs 10/11 share "a b c d e f" and "s t u" (two runs each, w=3)
      (10L, "a b c d e f p1 q1 r1 z1 s t u"),
      (11L, "x y a b c d e f p2 q2 r2 z2 s t u"),
      // within-doc repeat only → untouched
      (12L, "m n o k1 k2 k3 m n o"),
      (13L, "totally unrelated tokens here throughout"),
      // fully duplicated doc → empty string, not dropped
      (14L, "s t u"))
      .toDF("doc_id", "text")
    val out = Dedup.removeDuplicatedSpans(d, col("doc_id"), col("text"), w = 3)
      .select("id", "clean_text", "n_tokens_removed")
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(10L) == ("p1 q1 r1 z1", 9))       // runs [0,5] and [10,12] cut
    assert(out(11L) == ("x y p2 q2 r2 z2", 9))   // runs [2,7] and [12,14] cut
    assert(out(12L) == ("m n o k1 k2 k3 m n o", 0))
    assert(out(13L) == ("totally unrelated tokens here throughout", 0))
    assert(out(14L) == ("", 3))                  // shrinks to empty, still emitted
    assert(out.size == 5, "removal is not filtering: every doc re-emitted")
  }

  test("semanticDuplicates: pairs only within cells, above threshold") {
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)),
      (2L, Array(0.99f, 0.1f, 0f)),  // near-dup of 1, same cell
      (3L, Array(0f, 1f, 0f)),       // other cell
      (4L, Array(0.1f, 0.99f, 0f)),  // near-dup of 3, other cell
      (5L, Array(0.7f, 0.7f, 0f)))   // between cells: pairs only within its own
      .toDF("vec_id", "emb")
    val cents = Seq((10L, Array(1f, 0f, 0f)), (20L, Array(0f, 1f, 0f)))
      .toDF("cent_id", "cent")
    val out = Dedup.semanticDuplicates(vecs, col("vec_id"), col("emb"), cents, threshold = 0.9)
      .select("cell", "id_a", "id_b").as[(Long, Long, Long)].collect().toSet
    assert(out.contains((10L, 1L, 2L)))
    assert(out.contains((20L, 3L, 4L)))
    // 5 assigns to cell 10 (tie broken by cent_id): cos(5,1)=cos(5,2)≈0.707 < 0.9
    // and its high-cos partner set is empty → no cross-cell pair ever emitted
    assert(out.forall { case (_, a, b) => Set(a, b).subsetOf(Set(1L, 2L, 3L, 4L)) })
  }

  test("assignCells: map-only plan (zero shuffle exchanges) == window argmin, incl. ties") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import graft.functions.VectorFunctions.l2sq
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"), col("embedding").as("cent"))
    val assigned = Dedup.assignCells(emb, col("vec_id"), col("embedding"), cents)
    // plan shape: assignment must be a pure map pass over the corpus — the
    // centroid collapse is a SinglePartition agg + broadcast, never a
    // hashpartitioning shuffle (the explode+window formulation this replaced
    // shuffled n×k rows on __id)
    assigned.collect()
    val plan = (assigned.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"assignCells must not shuffle the corpus:\n$plan")
    // value parity with the formulation it replaced (ORDER BY dist, cent_id)
    val w = Window.partitionBy(col("__id")).orderBy(col("__dist").asc, col("cent_id"))
    val viaWindow = emb.select(col("vec_id").as("__id"), col("embedding").as("__v"))
      .crossJoin(broadcast(cents))
      .withColumn("__dist", l2sq(col("__v"), col("cent")))
      .withColumn("__arn", row_number().over(w))
      .filter(col("__arn") === 1)
      .select(col("__id"), col("cent_id").as("cell"))
      .as[(Long, Long)].collect().toMap
    val viaArgmin = assigned.select(col("__id"), col("cell"))
      .as[(Long, Long)].collect().toMap
    assert(viaArgmin == viaWindow)
  }

  test("verifyJaccard computes exact set Jaccard") {
    val docsSh = docs.select(col("doc_id").as("__id"), Dedup.shingles(col("text"), 3).as("__sh"))
    val pairs = Seq((1L, 4L), (1L, 3L)).toDF("id_a", "id_b")
    val j = Dedup.verifyJaccard(pairs, docsSh, "__id", "__sh")
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(j((1L, 4L)) == 1.0)
    assert(j((1L, 3L)) == 0.0)
  }

  // spread() sizing — asserted PLAN-TIME off the RepartitionByExpression
  // node (executing the huge synthetic inputs below is neither needed nor
  // affordable; .rdd under AQE would materialize the shuffle).
  private def spreadParts(df: org.apache.spark.sql.DataFrame, by: String): Int =
    Dedup.spread(df, col(by)).queryExecution.logical.collectFirst {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression =>
        r.numPartitions
    }.getOrElse(fail("spread must plan a RepartitionByExpression"))

  test("spread: partition count keeps growing past the old 4096 cap (VERDICT r17 #2)") {
    val par = spark.sparkContext.defaultParallelism
    spark.conf.set("graft.spread.target.bytes", (1L << 20).toString)
    spark.conf.set("graft.spread.max.factor", "100000")
    try {
      // spark.range carries EXACT stats (8 bytes/row): 2^33 rows = 64 GiB
      // estimated -> 65537 target partitions, far past the old fixed cap
      val big = spark.range(1L << 33).toDF
      assert(big.queryExecution.optimizedPlan.stats.sizeInBytes == BigInt(1L << 36),
        "fixture must carry exact range stats")
      val n = spreadParts(big, "id")
      assert(n > 4096, s"cap must scale with conf, got $n")
      assert(n == (1 << 16) + 1, s"one partition per target byte-chunk, got $n")
      // the cluster-proportional cap binds when the factor is small
      spark.conf.set("graft.spread.max.factor", "2")
      val capped = spreadParts(big, "id")
      assert(capped == 2 * par, s"cap = factor x defaultParallelism, got $capped")
    } finally {
      spark.conf.unset("graft.spread.target.bytes")
      spark.conf.unset("graft.spread.max.factor")
    }
  }

  test("spread: unknown stats (RDD-backed plan) fall back to defaultParallelism (ADVICE r17)") {
    val par = spark.sparkContext.defaultParallelism
    // createDataFrame over an RDD has no stats: sizeInBytes defaults to
    // spark.sql.defaultSizeInBytes (Long.MaxValue) — must NOT be sized as
    // if it were real data (explicit-count repartition is AQE-exempt)
    val rdd = spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L)), 1)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val unknown = spark.createDataFrame(rdd, schema)
    assert(unknown.queryExecution.optimizedPlan.stats.sizeInBytes >=
      Dedup.SpreadUnknownBytes, "fixture must model the no-stats fallback")
    val n = spreadParts(unknown, "id")
    assert(n == par, s"unknown stats must spread to defaultParallelism, got $n")
    // a small KNOWN input also floors at defaultParallelism (unchanged)
    assert(spreadParts(docs, "doc_id") == par)
  }
}
