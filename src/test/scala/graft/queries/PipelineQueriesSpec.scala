package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Invariants of the training-pipeline operators (values are hash-checked
  * against DuckDB by the driver; these pin the properties that must survive
  * refactors).
  */
class PipelineQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"

  test("split: partitions the corpus exactly (no row lost or double-assigned)") {
    val out = PipelineQueries.queries("pipeline_split")(spark, dir)
    val total = out.agg(sum("n")).head().getLong(0)
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total == docs)
    val splits = out.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    // roughly 8/1/1 by construction of the md5 bucket
    val train = out.filter(col("split") === "train").agg(sum("n")).head().getLong(0)
    assert(train > docs / 2, s"train split $train of $docs looks wrong")
  }

  test("split is deterministic across runs (hash of id, no RNG state)") {
    val a = PipelineQueries.queries("pipeline_split")(spark, dir).collect().toList
    val b = PipelineQueries.queries("pipeline_split")(spark, dir).collect().toList
    assert(a == b)
  }

  test("pack_batches: batch ids are consecutive from 0 per lang; all docs packed") {
    val out = PipelineQueries.queries("pipeline_pack_batches")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.map(_.getLong(2)).sum == docs) // n_docs sums to corpus
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val ids = rows.map(_.getLong(1)).sorted.toList
      assert(ids == (0L until ids.length).toList, s"batch ids not consecutive: $ids")
    }
  }

  test("pack_tokens: token conservation, fixed length, contiguous ordered sequences") {
    val out = PipelineQueries.queries("pipeline_pack_tokens")(spark, dir)
      .collect()
    // seq ids are contiguous from 0 — no position of the global stream is
    // lost or double-packed
    val ids = out.map(_.getLong(0)).toList
    assert(ids == (0L until ids.length).toList)
    // every sequence is full-length except possibly the tail
    out.init.foreach(r => assert(r.getLong(1) == 16L))
    assert(out.last.getLong(1) <= 16L)
    // conservation: packed tokens == Σ over docs of (len(bpe(text)) + 1 EOS)
    import org.apache.spark.sql.graftshim.Bridge
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val expected = docs.select(sum(size(Bridge.column(
      graft.functions.BpeEncode(Bridge.childExpr(col("text"))))) + 1))
      .head().getLong(0)
    assert(out.map(_.getLong(1)).sum == expected)
    // attribution: every sequence names ≥1 doc, and because the stream is
    // doc_id-ordered, the first contributing doc is nondecreasing
    assert(out.forall(_.getLong(3) >= 1))
    val los = out.map(_.getLong(4))
    assert(los.zip(los.tail).forall { case (a, b) => a <= b })
  }

  test("quantize_int8: symmetric range, max vector element maps to ±127") {
    val out = PipelineQueries.queries("emb_quantize_int8")(spark, dir)
    val bad = out.filter(col("q_max") > 127 || col("q_min") < -127).count()
    assert(bad == 0) // symmetric quantization never exceeds ±127
    // the absolutely-largest element hits the boundary for every vector
    val boundary = out.filter(col("q_max") === 127 || col("q_min") === -127).count()
    assert(boundary == out.count())
  }

  test("class_weights: inverse-frequency weights average to 1 over labels") {
    val out = PipelineQueries.queries("pipeline_class_weights")(spark, dir)
      .select(col("n"), col("weight")).collect()
    // sum over labels of n*weight = N  (each label contributes N/k)
    val n = out.map(_.getLong(0)).sum.toDouble
    val weighted = out.map(r => r.getLong(0) * r.getDouble(1)).sum
    assert(math.abs(weighted - n) / n < 1e-4)
  }

  test("cluster_split: partitions the corpus; dedup-away count matches dedup_clusters") {
    val out = PipelineQueries.queries("pipeline_cluster_split")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs)
    // clusters ≤ docs per split, and the total dedup-away count (docs minus
    // clusters) must equal dedup_clusters' row count — same pair parameters
    // (shingleWidth=3, threshold=0.8), independent code path
    out.foreach(r => assert(r.getAs[Long]("n_clusters") <= r.getAs[Long]("n_docs")))
    val dedupedAway = DedupQueries.queries("dedup_clusters")(spark, dir).count()
    val fromSplit = out.map(r => r.getAs[Long]("n_docs") - r.getAs[Long]("n_clusters")).sum
    assert(fromSplit == dedupedAway,
      s"split says $fromSplit docs deduped away, dedup_clusters says $dedupedAway")
    // leaks are a strict subset of the deduped-away docs (a leak needs a
    // multi-doc cluster AND a differing naive bucket)
    assert(out.map(_.getAs[Long]("n_naive_leaks")).sum <= dedupedAway)
  }

  test("mixture_upsample: repeat counts per doc differ by at most one within a lang") {
    val out = PipelineQueries.queries("pipeline_mixture_upsample")(spark, dir).collect()
    out.foreach { r =>
      val (n, after) = (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))
      // every doc repeats q or q+1 times → n·q ≤ n_after ≤ n·(q+1) for q = ⌊after/n⌋
      val q = after / n
      assert(after >= n * q && after <= n * (q + 1), s"${r.getAs[String]("lang")}: $after vs $n")
    }
    // the configured targets must actually bite in both directions on this corpus
    val byLang = out.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_before"), r.getAs[Long]("n_after"))).toMap
    assert(byLang("en")._2 < byLang("en")._1, "en (over target) must downsample")
    assert(byLang("zh")._2 > byLang("zh")._1, "zh (under target) must upsample")
  }

  test("curriculum: phases partition the corpus with fixed boundaries") {
    val out = PipelineQueries.queries("pipeline_curriculum")(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs)
    assert(out.map(_.getAs[Int]("phase")).toSet.subsetOf(Set(0, 1, 2, 3)))
  }

  test("hard_negatives: 5 ranked negatives per query, all below the positive band") {
    val out = PipelineQueries.queries("pipeline_hard_negatives")(spark, dir).collect()
    val perQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.size == 10)
    perQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 5), s"query $q ranks")
      rows.foreach { r =>
        assert(r.getAs[Double]("cos") < 0.45, s"query $q has a positive-band negative")
        assert(r.getAs[Long]("neighbor_id") != q)
      }
      // ranks are ordered by descending cosine
      val byRank = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b }, s"query $q order")
    }
  }

  test("dsir: top-k non-target docs ranked by descending importance weight") {
    val out = PipelineQueries.queries("pipeline_dsir")(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.forall(_.getAs[String]("lang") != "en"), "target-domain doc leaked into selection")
    assert(out.map(_.getAs[Int]("rn")).toSeq == (1 to out.length), "ranks not consecutive")
    val w = out.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("dsir_weight"))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b }, "weights not descending by rank")
  }

  test("dsir is deterministic across runs (integer-quantized log-ratio sums)") {
    val a = PipelineQueries.queries("pipeline_dsir")(spark, dir).collect().toList
    val b = PipelineQueries.queries("pipeline_dsir")(spark, dir).collect().toList
    assert(a == b)
  }

  test("temperature_mix: flattened shares sum to 1 and boost low-resource langs") {
    val out = PipelineQueries.queries("pipeline_temperature_mix")(spark, dir).collect()
    assert(math.abs(out.map(_.getAs[Double]("p_raw")).sum - 1.0) < 1e-4)
    assert(math.abs(out.map(_.getAs[Double]("p_temp")).sum - 1.0) < 1e-4)
    out.foreach { r =>
      val (pRaw, pTemp, rate) = (r.getAs[Double]("p_raw"),
        r.getAs[Double]("p_temp"), r.getAs[Double]("keep_rate"))
      assert(rate > 0 && rate <= 1.0, s"${r.getAs[String]("lang")} rate $rate out of range")
      // temperature 0.5 moves every share toward uniform: below-average
      // languages gain, above-average languages shrink
      val uniform = 1.0 / out.length
      if (pRaw < uniform) assert(pTemp > pRaw) else if (pRaw > uniform) assert(pTemp < pRaw)
    }
  }
}
