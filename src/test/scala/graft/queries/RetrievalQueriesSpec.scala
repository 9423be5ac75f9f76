package graft.queries

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture
import graft.functions.{Bloom, TextFunctions}

/** Invariants of the retrieval operators (values are hash-checked against
  * DuckDB by the driver; these pin the properties that must survive
  * refactors).
  */
class RetrievalQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("bm25: scores are positive, non-increasing, and rank at most 20 docs") {
    val rows = RetrievalQueries.queries("text_bm25_topk")(spark, dir).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sorted.reverse), "not sorted by score desc")
  }

  test("bm25: a document repeating a query term beats one without it") {
    import spark.implicits._
    // tf saturation sanity on a controlled corpus via the gate's scorer
    // shape: rare term > absent term, and repeated term > single occurrence
    // but sub-linearly (k1 saturation).
    val df = RetrievalQueries.queries("text_bm25_topk")(spark, dir)
    val top = df.head()
    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .filter($"doc_id" === top.getLong(0)).head().getString(1)
    assert(Seq("data", "query", "join", "fast").exists(corpus.contains),
      "top BM25 doc contains none of the query terms")
  }

  test("rrf: fused score equals 1/(60+lex)+1/(60+vec) with 0-rank = absent") {
    val rows = RetrievalQueries.queries("retrieval_rrf_fusion")(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { case Row(_: Long, lex: Int, vec: Int, rrf: Double) =>
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (vec > 0) 1.0 / (60 + vec) else 0.0)
      assert(math.abs(rrf - expect) < 5e-7, s"rrf $rrf != $expect")
      assert(lex >= 0 && lex <= 100 && vec >= 0 && vec <= 100)
    }
    // a doc ranked by BOTH lists must outscore one ranked by neither
    assert(rows.forall(r => r.getInt(1) > 0 || r.getInt(2) > 0),
      "top-20 fused doc in neither ranker's top-100")
  }

  test("bloom: no false negatives — every corpus fingerprint probes true") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", TextFunctions.md5Hash60($"text").as("fp"))
    val bitmap = docs.filter($"doc_id" % 2 === 0)
      .agg(Bloom.bitmapAgg($"fp", 65536, 4).as("bm"))
    val selfProbe = docs.filter($"doc_id" % 2 === 0)
      .crossJoin(broadcast(bitmap))
      .select(Bloom.contains($"fp", $"bm", 65536, 4).as("hit"))
      .collect()
    assert(selfProbe.forall(_.getBoolean(0)), "Bloom false negative — impossible by construction")
  }

  test("bloom: probe agrees with the exact bit-position semantics") {
    import spark.implicits._
    // re-derive maybe_member declaratively (positions ⊆ corpus positions)
    // and compare with the bitmap/probe result row-for-row
    val out = RetrievalQueries.queries("dedup_bloom_probe")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", TextFunctions.md5Hash60($"text").as("fp"))
    def positions(fp: Long): Seq[Int] = {
      val out = new Array[Int](4); Bloom.positions(fp, 65536, 4, out); out.toSeq
    }
    val rows = docs.collect().map(r => r.getLong(0) -> r.getLong(1))
    val corpusBits = rows.filter(_._1 % 2 == 0).flatMap(p => positions(p._2)).toSet
    rows.filter(_._1 % 2 == 1).foreach { case (id, fp) =>
      val expect = positions(fp).forall(corpusBits)
      assert(out(id) == expect, s"doc $id: probe ${out(id)} vs exact $expect")
    }
    // the fixture's corpora are distinct texts, so at 1 KiB / 250 inserts
    // some probes must be false (the filter is not saturated)
    assert(out.values.exists(_ == false), "Bloom bitmap saturated — m too small for corpus")
  }

  test("partitioned bloom: P-sharded probe == single-bitmap probe, and shards it") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", TextFunctions.md5Hash60($"text").as("fp"))
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val fresh = docs.filter($"doc_id" % 2 === 1)
    // same total capacity split over 8 shards: every corpus member still
    // probes true (per-shard no-false-negatives), and the full result is
    // deterministic
    val sharded = Bloom.partitionedProbe(corpus, fresh, "fp", 65536, 4, 8)
      .select($"doc_id", $"maybe_member").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val selfProbe = Bloom.partitionedProbe(corpus, corpus, "fp", 65536, 4, 8)
      .select($"maybe_member").collect()
    assert(selfProbe.forall(_.getBoolean(0)), "sharded Bloom false negative")
    // sharding changes which hashes share a bitmap, so FP sets differ from
    // the single-bitmap gate — but every true member must agree, and the
    // 8x capacity can only reduce false positives on the fresh side
    val single = RetrievalQueries.queries("dedup_bloom_probe")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val truePos = docs.filter($"doc_id" % 2 === 1).as[(Long, Long)].collect()
      .filter { case (_, fp) => corpus.as[(Long, Long)].collect().exists(_._2 == fp) }
      .map(_._1).toSet
    truePos.foreach(id => assert(sharded(id), s"true member $id must probe true"))
    val fpSingle = single.count { case (id, hit) => hit && !truePos(id) }
    val fpSharded = sharded.count { case (id, hit) => hit && !truePos(id) }
    assert(fpSharded <= fpSingle,
      s"8x capacity should not increase false positives: $fpSharded > $fpSingle")
  }

  test("bloom bitmap: merge is OR (distributed build == single-partition build)") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(TextFunctions.md5Hash60($"text").as("fp"))
    val many = docs.repartition(8).agg(Bloom.bitmapAgg($"fp", 65536, 4)).head().getSeq[Long](0)
    val one = docs.coalesce(1).agg(Bloom.bitmapAgg($"fp", 65536, 4)).head().getSeq[Long](0)
    assert(many == one)
  }
}
