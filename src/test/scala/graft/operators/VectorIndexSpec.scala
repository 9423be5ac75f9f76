package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** The persistable/appendable IVFADC index contract:
  *  - the quantizer + codes survive a parquet round-trip;
  *  - appendBatch indexes a fresh batch WITHOUT touching the corpus, and
  *    the appended index answers exactly like a from-scratch encode of the
  *    combined corpus under the same frozen quantizer (the cross-engine
  *    dual of this equality is the ann_ivfpq_append oracle gate);
  *  - the encode path is map-only: zero shuffle exchanges on the vector
  *    side — that plan property IS what makes appends corpus-free.
  */
class VectorIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val dir = "/root/testdata/sf0.001"
  private val pq = PqParams(m = 4, subDim = 16, k = 16)

  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")
  private def corpus = emb.filter(col("vec_id") % 10 =!= 7)
  private def fresh = emb.filter(col("vec_id") % 10 === 7 && col("vec_id") >= 64)
  private def queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))

  test("encode shuffles only inside broadcast build sides: the vector side is map-only") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    // Spark renders shuffles as plain "Exchange" (ShuffleExchangeExec.nodeName),
    // so a string count of "ShuffleExchange" is vacuously zero (r10 ADVICE) —
    // walk the tree instead, and STOP at broadcast build sides: the tiny
    // quantizer-build aggregations (collect_list of centroids/codebook, k and
    // m·k rows) legitimately shuffle beneath their BroadcastExchange, while
    // the fresh-vector scan itself must reach the result without one.
    def shufflesOutsideBroadcast(p: SparkPlan): Int = p match {
      case _: BroadcastExchangeLike => 0
      case a: AdaptiveSparkPlanExec => shufflesOutsideBroadcast(a.executedPlan)
      case q: QueryStageExec => shufflesOutsideBroadcast(q.plan)
      case s: ShuffleExchangeLike => 1 + s.children.map(shufflesOutsideBroadcast).sum
      case other => other.children.map(shufflesOutsideBroadcast).sum
    }
    val plan = VectorIndex.encode(fresh, col("vec_id"), col("embedding"), quant)
      .queryExecution.executedPlan
    // sanity: the walk actually sees the quantizer-build shuffles, proving it
    // is not the vacuous matcher this test replaced
    def allShuffles(p: SparkPlan): Int = p match {
      case a: AdaptiveSparkPlanExec => allShuffles(a.executedPlan)
      case q: QueryStageExec => allShuffles(q.plan)
      case s: ShuffleExchangeLike => 1 + s.children.map(allShuffles).sum
      case other => other.children.map(allShuffles).sum
    }
    assert(allShuffles(plan) > 0,
      "expected the quantizer-build aggregations to shuffle beneath their broadcasts " +
        "(if this is now zero the walk is broken, not the plan improved)")
    val outside = shufflesOutsideBroadcast(plan)
    assert(outside == 0,
      s"append-path encode must not shuffle the vector side (broadcast quantizer only), " +
        s"got $outside outside broadcast build sides:\n$plan")
  }

  test("parquet round-trip + appendBatch == in-memory union; codes are cell-partitioned") {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    val corpusCodes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant)
    VectorIndex.write(quant, corpusCodes, path)

    // the daily-ingest path: index the fresh batch into the PERSISTED index
    VectorIndex.appendBatch(spark, path, fresh, col("vec_id"), col("embedding"), pq)

    val loadedQ = VectorIndex.loadQuantizer(spark, path, pq)
    val loadedCodes = VectorIndex.loadCodes(spark, path)
    val nVecs = corpus.count() + fresh.count()
    assert(loadedCodes.count() == nVecs * pq.m,
      "one code row per (vector, subspace) after the append")

    // cell-partitioned layout on disk: the coarse index IS the directory tree
    val cellDirs = new java.io.File(s"$path/codes").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs > 1, s"codes must be laid out partitioned by cell, got $cellDirs dirs")

    // answers from the persisted+appended index == answers from the
    // in-memory union (same quantizer, same codes — the round trip must
    // not perturb anything)
    val freshCodes = VectorIndex.encode(fresh, col("vec_id"), col("embedding"), quant)
    val fromDisk = VectorIndex.searchAdc(loadedCodes, loadedQ, queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val inMem = VectorIndex.searchAdc(corpusCodes.union(freshCodes), quant, queries,
      nprobe = 4, topK = 5).orderBy("query_id", "rn").collect().toSeq
    assert(fromDisk == inMem, "persisted index must answer exactly like the in-memory one")
    assert(fromDisk.nonEmpty)
  }

  test("searchAdcPruned: probed-cell partition filter reaches the scan, answers unchanged") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_prune").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant), path)
    val loaded = VectorIndex.loadCodes(spark, path)
    // 2 queries × nprobe 2 → at most 4 of the 16 cell directories survive
    val qs = queries.filter(col("query_id") < 2)
    val pruned = VectorIndex.searchAdcPruned(loaded, quant, qs, nprobe = 2, topK = 5)
    val full = VectorIndex.searchAdc(loaded, quant, qs, nprobe = 2, topK = 5)
    // execute THIS QueryExecution first (AQE materializes the final plan
    // at execution; collect-by-sorted-copy would plan a separate one)
    def sorted(rows: Array[org.apache.spark.sql.Row]) =
      rows.toSeq.sortBy(r => (r.getLong(0), r.getInt(3)))
    assert(sorted(pruned.collect()) == sorted(full.collect()),
      "pruning must not change any answer")
    // AQE wraps executed stages as LEAF QueryStageExec nodes — descend into
    // them (and re-entrant adaptive plans) to reach the file scans
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case q: QueryStageExec => scansOf(q.plan)
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      }.flatten
    val scans = scansOf(pruned.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
    assert(scans.nonEmpty, "codes file scan not found in the pruned plan")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "probed-cell filter must reach the scan as a partition filter")
    val survived = scan.relation.location.listFiles(scan.partitionFilters, Nil).size
    assert(survived <= 4 && survived >= 1,
      s"at most 2 queries × 2 probes = 4 of 16 cell dirs may survive, got $survived")
  }

  test("upsertBatch: tombstones + changed vectors == full re-encode; untouched cells byte-identical") {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_upsert").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant), path)

    // change batch: a NARROW id slice (the untouched-cells assertion below
    // needs most cells to stay out of the change set) — delete ids ≡3
    // (mod 10), update ids ≡4 (mod 10) with a reversed (deterministically
    // perturbed) embedding; ids ≥ 64 so every training seed and query row
    // stays put
    val delC = col("vec_id") % 10 === 3 && col("vec_id") >= 64 && col("vec_id") < 110
    val updC = col("vec_id") % 10 === 4 && col("vec_id") >= 64 && col("vec_id") < 110
    val updates = corpus.filter(updC)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val deletes = corpus.filter(delC).select(col("vec_id"))

    // fingerprint every cell file BEFORE the upsert
    def fileSig(path: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length, f.lastModified)).toMap
    }
    val before = fileSig(s"$path/codes")

    VectorIndex.upsertBatch(spark, path, updates, deletes,
      col("vec_id"), col("embedding"), pq)

    // equivalence: the maintained index answers exactly like a from-scratch
    // encode of (corpus − deleted) ∪ updated under the same frozen quantizer
    val post = corpus.filter(!delC && !updC)
      .select(col("vec_id"), col("embedding"))
      .union(updates)
    val rebuilt = VectorIndex.encode(post, col("vec_id"), col("embedding"), quant)
    val fromIndex = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val fromRebuild = VectorIndex.searchAdc(rebuilt, quant, queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    assert(fromIndex == fromRebuild,
      "upserted index must answer exactly like the full re-encode of the post-change corpus")
    assert(fromIndex.nonEmpty)
    // no deleted id is retrievable even in a widened result
    val wide = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 16, topK = 200)
    assert(wide.filter(col("neighbor_id") % 10 === 3 &&
        col("neighbor_id") >= 64 && col("neighbor_id") < 110).count() == 0,
      "tombstoned vectors must be gone from the index")

    // the 100 TB property: cells the change batch never touched keep their
    // files byte-for-byte (same paths, sizes, mtimes) — only touched cell
    // partitions were rewritten
    val touched = {
      val codes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant)
      val changedIds = updates.select("vec_id").union(deletes).distinct()
      val oldCells = codes.join(broadcast(changedIds), Seq("vec_id"), "left_semi")
        .select("cell").distinct().collect().map(_.getAs[Number](0).longValue).toSet
      val newCells = VectorIndex.encode(updates, col("vec_id"), col("embedding"), quant)
        .select("cell").distinct().collect().map(_.getAs[Number](0).longValue).toSet
      oldCells ++ newCells
    }
    val after = fileSig(s"$path/codes")
    val untouchedBefore = before.filterNot { case (p, _) => touched.exists(c => p.contains(s"cell=$c/")) }
    val untouchedAfter = after.filterNot { case (p, _) => touched.exists(c => p.contains(s"cell=$c/")) }
    assert(untouchedBefore.nonEmpty, "fixture must leave some cells untouched for the test to mean anything")
    assert(untouchedAfter == untouchedBefore,
      "untouched cell partitions must survive the upsert byte-for-byte (no corpus rewrite)")

    // occupancy was maintained incrementally and still equals a recount
    val occ = VectorIndex.occupancy(spark, path).orderBy("cell").collect().toSeq
    val recount = VectorIndex.cellOccupancy(VectorIndex.loadCodes(spark, path))
      .orderBy("cell").collect().toSeq
    assert(occ == recount, "incrementally-maintained occupancy must equal a recount")
  }

  test("upsertBatch removes a cell directory when its every vector is deleted") {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_empty").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    val codes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant)
    VectorIndex.write(quant, codes, path)
    // tombstone EVERY vector of one populated cell
    val someCell = codes.select("cell").head().getAs[Number](0).longValue
    val condemned = codes.filter(col("cell") === someCell && col("m") === 0).select("vec_id")
    val emptyUpdates = corpus.limit(0).select(col("vec_id"), col("embedding"))
    VectorIndex.upsertBatch(spark, path, emptyUpdates, condemned,
      col("vec_id"), col("embedding"), pq)
    assert(!new java.io.File(s"$path/codes/cell=$someCell").exists(),
      "a fully-tombstoned cell must not leave a stale partition directory")
    assert(VectorIndex.loadCodes(spark, path).filter(col("cell") === someCell).count() == 0)
    // occupancy no longer lists the emptied cell
    assert(VectorIndex.occupancy(spark, path).filter(col("cell") === someCell).count() == 0)
  }

  test("compactCells: N appends leave N files per touched cell; compaction restores 1, answers unchanged") {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_compact").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant), path)
    // three daily ingests
    val batches = Seq(
      emb.filter(col("vec_id") % 10 === 7 && col("vec_id") >= 64 && col("vec_id") < 200),
      emb.filter(col("vec_id") % 10 === 7 && col("vec_id") >= 200 && col("vec_id") < 400),
      emb.filter(col("vec_id") % 10 === 7 && col("vec_id") >= 400))
    batches.foreach(b =>
      VectorIndex.appendBatch(spark, path, b, col("vec_id"), col("embedding"), pq))
    def filesPerCell(): Map[String, Int] =
      new java.io.File(VectorIndex.snapshot(spark, path).partPath("codes")).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(d => d.getName -> d.listFiles().count(_.getName.endsWith(".parquet"))).toMap
    val beforeCounts = filesPerCell()
    assert(beforeCounts.values.max > 1,
      s"appends must have fragmented at least one cell, got $beforeCounts")
    val answerBefore = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq

    VectorIndex.compactCells(spark, path)

    val afterCounts = filesPerCell()
    assert(afterCounts.values.forall(_ == 1),
      s"every cell must hold exactly one file post-compaction, got $afterCounts")
    assert(afterCounts.keySet == beforeCounts.keySet, "no cell may vanish in compaction")
    val answerAfter = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    assert(answerAfter == answerBefore, "compaction must not change any answer")
    assert(answerAfter.nonEmpty)
    // the pruned search still prunes over the compacted layout
    val qs = queries.filter(col("query_id") < 2)
    val pruned = VectorIndex.searchAdcPruned(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), qs, nprobe = 2, topK = 5)
      .collect().toSeq
    assert(pruned.nonEmpty)
  }

  test("occupancy accounting surfaces quantizer skew on a deliberately skewed corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 56 of 64 vectors huddle around one point; 8 scatter far away —
    // k-means (8 cells, seeded from the first rows) must leave one hot cell
    val dim = 64
    val base = Array.fill(dim)(rnd.nextFloat() * 0.01f)
    val skewed = ((0 until 8).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d == i) 50f else 0f) + rnd.nextFloat() * 0.01f))
    } ++ (8 until 64).map { i =>
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.01f))
    }).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_skew").toString
    val quant = VectorIndex.train(skewed, col("vec_id"), col("embedding"),
      kCells = 8, iters = 2, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(skewed, col("vec_id"), col("embedding"), quant), path)
    val report = VectorIndex.occupancyReport(spark, path).head()
    val (nVecs, maxCell, imbalance) =
      (report.getAs[Long]("n_vecs"), report.getAs[Long]("max_cell"),
        report.getAs[Double]("imbalance"))
    assert(nVecs == 64L)
    assert(maxCell >= 56L, s"the huddle must land in one hot cell, got max_cell=$maxCell")
    assert(imbalance > 3.0,
      s"skew this extreme must surface in the imbalance factor, got $imbalance")
    // occupancy stays a recount-invariant through an append
    VectorIndex.appendBatch(spark, path,
      Seq((100L, base.map(_ + 0.001f))).toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), pq)
    val occ = VectorIndex.occupancy(spark, path).orderBy("cell").collect().toSeq
    val recount = VectorIndex.cellOccupancy(VectorIndex.loadCodes(spark, path))
      .orderBy("cell").collect().toSeq
    assert(occ == recount, "append-maintained occupancy must equal a recount")
    assert(occ.map(_.getAs[Long]("n_vecs")).sum == 65L)
  }

  test("hot-cell split: probe cost reduced, rebuild-equivalence holds, recovery converges, loop reaches the bound") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val dim = 64
    // 8 spike outliers (the k-means seeds — one cell each) and a 56-vector
    // huddle that lands in ONE hot cell; the huddle is BIMODAL (28 near
    // the origin, 28 offset by 5.0 in dims 10..20 — far smaller than the
    // spikes' 50, so both modes share the parent cell) so a sub-train has
    // real structure to find
    def mkCorpus() = ((0 until 8).map { i =>
      (i.toLong, Array.tabulate(dim)(d => (if (d == i) 50f else 0f) + rnd.nextFloat() * 0.01f))
    } ++ (8 until 36).map { i =>
      (i.toLong, Array.tabulate(dim)(_ => rnd.nextFloat() * 0.01f))
    } ++ (36 until 64).map { i =>
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d >= 10 && d <= 20) 5f else 0f) + rnd.nextFloat() * 0.01f))
    }).toDF("vec_id", "embedding")
    val corpusRows = mkCorpus().as[(Long, Array[Float])].collect().toSeq
    def corpusDf = corpusRows.toDF("vec_id", "embedding")

    def build(path: String): Unit = {
      val quant = VectorIndex.train(corpusDf, col("vec_id"), col("embedding"),
        kCells = 8, iters = 2, pq = pq)
      VectorIndex.write(quant,
        VectorIndex.encode(corpusDf, col("vec_id"), col("embedding"), quant), path)
    }
    def answers(path: String) = VectorIndex.searchAdc(
      VectorIndex.loadCodes(spark, path), VectorIndex.loadQuantizer(spark, path, pq),
      corpusDf.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      nprobe = 3, topK = 5).orderBy("query_id", "rn").collect().toSeq

    val path = java.nio.file.Files.createTempDirectory("graft_vindex_split").toString
    build(path)
    val before = VectorIndex.occupancyReport(spark, path).head()
    assert(before.getAs[Long]("max_cell") > 10L, "fixture must start hot")
    val centsBefore = spark.read.parquet(VectorIndex.snapshot(spark, path).partPath("cents"))
      .select("cent_id").collect().map(_.getLong(0)).toSet

    // balanced-enough index: the policy declines to act
    assert(VectorIndex.splitHottestCell(spark, path, corpusDf, col("vec_id"),
      col("embedding"), pq, maxCellRows = 1000L) == VectorIndex.Balanced,
      "below the bound the policy must do nothing")

    val VectorIndex.Split(parent, children) = VectorIndex.splitHottestCell(spark, path,
      corpusDf, col("vec_id"), col("embedding"), pq, maxCellRows = 10L)
    assert(children.size == 2 && children.forall(!centsBefore.contains(_)),
      "children must be two FRESH cell ids")
    val centsAfter = spark.read.parquet(VectorIndex.snapshot(spark, path).partPath("cents"))
      .select("cent_id").collect().map(_.getLong(0)).toSet
    assert(centsAfter == centsBefore - parent ++ children,
      "the parent centroid is replaced by the two children")
    assert(!new java.io.File(
      VectorIndex.snapshot(spark, path).partPath("codes") + s"/cell=$parent").exists(),
      "the emptied parent partition directory must be dropped")

    // nothing lost, nothing duplicated: every vector still has m code rows
    val perVec = VectorIndex.loadCodes(spark, path).groupBy("vec_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVec.keySet == (0L until 64L).toSet)
    assert(perVec.values.forall(_ == pq.m.toLong))

    // the split's contract: the index now answers EXACTLY like a
    // from-scratch encode under the post-split centroid table
    val postQuant = VectorIndex.loadQuantizer(spark, path, pq)
    val rebuilt = VectorIndex.encode(corpusDf, col("vec_id"), col("embedding"), postQuant)
    val fromSplit = answers(path)
    val fromRebuild = VectorIndex.searchAdc(rebuilt, postQuant,
      corpusDf.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      nprobe = 3, topK = 5).orderBy("query_id", "rn").collect().toSeq
    assert(fromSplit == fromRebuild, "split index must equal the from-scratch rebuild")
    assert(fromSplit.nonEmpty)

    // the skew signal responded: the hot probe's cost shrank (max/mean
    // `imbalance` stays the ALERT, not the target — a split adds a cell
    // and shrinks the mean, so the ratio can rise as the max halves)
    val after = VectorIndex.occupancyReport(spark, path).head()
    assert(after.getAs[Long]("max_cell") < before.getAs[Long]("max_cell"),
      "the hottest probe must read less after the split")
    // occupancy stayed a recount-invariant through the split
    assert(VectorIndex.occupancy(spark, path).orderBy("cell").collect().toSeq ==
      VectorIndex.cellOccupancy(VectorIndex.loadCodes(spark, path))
        .orderBy("cell").collect().toSeq)

    // CRASH RECOVERY: same index, the split dies right after staging its
    // manifest — recoverSplit must roll it forward to the identical state
    val path2 = java.nio.file.Files.createTempDirectory("graft_vindex_split2").toString
    build(path2)
    val memberIds = VectorIndex.loadCodes(spark, path2)
      .filter(col("cell") === parent).select(col("vec_id").as("__m")).distinct()
    val members = corpusDf.join(memberIds, col("vec_id") === col("__m"), "left_semi")
    val sub = KMeans.fit(members, col("vec_id"), col("embedding"), k = 2, iters = 3)
      .orderBy("cent_id").collect()
    val maxId = spark.read.parquet(VectorIndex.snapshot(spark, path2).partPath("cents"))
      .agg(max(col("cent_id"))).head().getLong(0)
    sub.zipWithIndex.map { case (r, i) =>
      (parent, maxId + 1 + i, r.getAs[scala.collection.Seq[Double]]("cent").toSeq)
    }.toSeq.toDF("parent", "cent_id", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path2/split_staging")
    VectorIndex.recoverSplit(spark, path2, corpusDf, col("vec_id"), col("embedding"), pq)
    assert(!new java.io.File(s"$path2/split_staging").exists(),
      "recovery must consume the manifest")
    assert(spark.read.parquet(VectorIndex.snapshot(spark, path2).partPath("cents")).select("cent_id")
      .collect().map(_.getLong(0)).toSet == centsAfter,
      "recovery must converge to the same centroid table as the clean split")
    assert(answers(path2) == fromSplit,
      "the recovered index must answer exactly like the cleanly-split one")

    // a PARTIAL manifest (no _SUCCESS — the staging write itself crashed)
    // rolls BACK: nothing had mutated, the debris is dropped
    val debris = new java.io.File(s"$path2/split_staging")
    debris.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(debris, "part-garbage.parquet").toPath, "not parquet")
    val preRollback = answers(path2)
    VectorIndex.recoverSplit(spark, path2, corpusDf, col("vec_id"), col("embedding"), pq)
    assert(!debris.exists(), "a partial manifest is rolled back (deleted)")
    assert(answers(path2) == preRollback, "rollback must not touch the index")

    // the policy LOOP: keep splitting while a cell exceeds the absolute
    // probe-cost bound; terminates with every cell under it
    var splits = 0
    var outcome: VectorIndex.SplitOutcome = VectorIndex.Split(-1L, Nil)
    while (splits < 12 && outcome.isInstanceOf[VectorIndex.Split]) {
      outcome = VectorIndex.splitHottestCell(spark, path, corpusDf,
        col("vec_id"), col("embedding"), pq, maxCellRows = 10L)
      if (outcome.isInstanceOf[VectorIndex.Split]) splits += 1
    }
    assert(outcome == VectorIndex.Balanced, s"the split loop must terminate, got $outcome")
    val maxAfterLoop = VectorIndex.occupancyReport(spark, path).head().getAs[Long]("max_cell")
    assert(maxAfterLoop <= 10L,
      s"the loop must drive every cell under the bound, got max $maxAfterLoop")
    // still rebuild-equivalent after every loop split
    val finalQuant = VectorIndex.loadQuantizer(spark, path, pq)
    val finalRebuild = VectorIndex.searchAdc(
      VectorIndex.encode(corpusDf, col("vec_id"), col("embedding"), finalQuant),
      finalQuant, corpusDf.filter(col("vec_id") < 4)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      nprobe = 3, topK = 5).orderBy("query_id", "rn").collect().toSeq
    assert(answers(path) == finalRebuild)
  }

  test("splitHottestCell flags NeedsRetrain when the hot cell's members are quantizer-indistinguishable") {
    import spark.implicits._
    // two spike seeds plus 20 IDENTICAL vectors: the sub-train's two
    // centroids coincide, every member lands in the first child, the split
    // cannot reduce the hot cell — the policy must say so instead of
    // letting a caller loop forever
    val dim = 64
    val same = Array.tabulate(dim)(_ => 0.5f)
    val corpusDf = ((0 until 2).map { i =>
      (i.toLong, Array.tabulate(dim)(d => if (d == i) 50f else 0f))
    } ++ (2 until 22).map(i => (i.toLong, same.clone()))).toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_retrain").toString
    val quant = VectorIndex.train(corpusDf, col("vec_id"), col("embedding"),
      kCells = 2, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpusDf, col("vec_id"), col("embedding"), quant), path)
    // the first step may legitimately peel the spike seed off the hot cell
    // (that IS a useful split); the identical 20-vector mass must then flag
    var outcome = VectorIndex.splitHottestCell(spark, path, corpusDf, col("vec_id"),
      col("embedding"), pq, maxCellRows = 5L)
    var steps = 1
    while (steps < 4 && outcome.isInstanceOf[VectorIndex.Split]) {
      outcome = VectorIndex.splitHottestCell(spark, path, corpusDf, col("vec_id"),
        col("embedding"), pq, maxCellRows = 5L)
      steps += 1
    }
    outcome match {
      case VectorIndex.NeedsRetrain(_, rows) =>
        assert(rows >= 20L, s"the flagged cell must be the identical-member one, got $rows")
      case other => fail(s"an unsplittable hot cell must flag NeedsRetrain, got $other")
    }
    // the ineffective split is harmless: everything still coded once and
    // rebuild-equivalence holds under whatever the centroid table now is
    val perVec = VectorIndex.loadCodes(spark, path).groupBy("vec_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perVec.keySet == (0L until 22L).toSet)
    assert(perVec.values.forall(_ == pq.m.toLong))
    val postQuant = VectorIndex.loadQuantizer(spark, path, pq)
    val qs = corpusDf.filter(col("vec_id") < 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val got = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path), postQuant,
      qs, nprobe = 2, topK = 5).orderBy("query_id", "rn").collect().toSeq
    val want = VectorIndex.searchAdc(
      VectorIndex.encode(corpusDf, col("vec_id"), col("embedding"), postQuant),
      postQuant, qs, nprobe = 2, topK = 5).orderBy("query_id", "rn").collect().toSeq
    assert(got == want)
  }

  test("appended index == full re-encode of the combined corpus under the frozen quantizer") {
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    val appended = VectorIndex
      .encode(corpus, col("vec_id"), col("embedding"), quant)
      .union(VectorIndex.encode(fresh, col("vec_id"), col("embedding"), quant))
    val rebuilt = VectorIndex.encode(corpus.union(fresh), col("vec_id"), col("embedding"), quant)
    val a = VectorIndex.searchAdc(appended, quant, queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val r = VectorIndex.searchAdc(rebuilt, quant, queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    assert(a == r, "append-under-frozen-quantizer must equal the combined re-encode")
    // and the fresh batch is genuinely in the index: some fresh id must be
    // retrievable as a neighbor somewhere in a widened result
    val wide = VectorIndex.searchAdc(appended, quant, queries, nprobe = 4, topK = 50)
    val freshHits = wide.filter(col("neighbor_id") % 10 === 7 && col("neighbor_id") >= 64).count()
    assert(freshHits > 0, "fresh vectors must be reachable through the appended index")
  }

  test("filtered search: metadata predicate reaches the pruned scan; top-k never starves post-filter") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_filtered").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    val codes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant,
      meta = Seq("label"))
    assert(codes.columns.contains("label"), "meta-aware encode must carry the column")
    VectorIndex.write(quant, codes, path)

    val loaded = VectorIndex.loadCodes(spark, path, meta = Seq("label"))
    val pred = col("label") % 2 === 0
    val qs = queries.filter(col("query_id") < 2)
    val filtered = VectorIndex.searchAdcPruned(loaded, quant, qs,
      nprobe = 8, topK = 5, predicate = Some(pred))
    val rows = filtered.collect()

    // every neighbor satisfies the predicate (label rides on the codes)
    val labels = corpus.select(col("vec_id"), col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows.nonEmpty)
    assert(rows.forall(r => labels(r.getLong(1)) % 2 == 0),
      "every returned neighbor must match the metadata predicate")

    // NO POST-FILTER STARVATION: per query, exactly min(topK, matching
    // candidates in the probed cells) rows come back — the top-k ranks
    // only matching candidates, it does not rank-then-drop
    val fullUnfiltered = VectorIndex.searchAdc(loaded, quant, qs, nprobe = 8, topK = 2000)
    val inProbed = fullUnfiltered.join(
        corpus.select(col("vec_id").as("neighbor_id"), col("label")), "neighbor_id")
      .filter(col("label") % 2 === 0)
      .groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val returned = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    returned.foreach { case (q, n) =>
      assert(n == math.min(5L, inProbed.getOrElse(q, 0L)),
        s"query $q returned $n rows but probed cells hold ${inProbed.getOrElse(q, 0L)} matches")
    }
    assert(returned.values.sum > 0)

    // plan: the predicate reaches the codes scan (pushed or data filter),
    // composed with the probed-cell partition pruning
    def scansOf(p: SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case q: QueryStageExec => scansOf(q.plan)
        case a: AdaptiveSparkPlanExec => scansOf(a.executedPlan)
      }.flatten
    val scans = scansOf(filtered.queryExecution.executedPlan)
      .filter(_.relation.location.rootPaths.exists(_.toString.contains("codes")))
    assert(scans.nonEmpty, "codes file scan not found")
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty, "probed-cell partition filter must still prune")
    assert(scan.dataFilters.exists(_.references.exists(_.name == "label")),
      s"label predicate must reach the scan's data filters, got ${scan.dataFilters}")
    assert(scan.metadata.get("PushedFilters").exists(_.contains("label")),
      s"label predicate must be pushed to parquet, got ${scan.metadata.get("PushedFilters")}")

    // equivalence with in-memory filter-then-score
    val inMem = VectorIndex.searchAdc(
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant, meta = Seq("label"))
        .filter(pred), quant, qs, nprobe = 8, topK = 5)
    def sorted(rs: Array[org.apache.spark.sql.Row]) =
      rs.toSeq.sortBy(r => (r.getLong(0), r.getInt(3)))
    assert(sorted(rows) == sorted(inMem.collect()),
      "persisted filtered search must equal in-memory filter-then-score")

    // metadata-aware upsert keeps the carried columns on rewritten rows
    val upd = corpus.filter(col("vec_id") >= 20 && col("vec_id") < 24)
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"), col("label"))
    VectorIndex.upsertBatch(spark, path, upd, corpus.limit(0).select(col("vec_id")),
      col("vec_id"), col("embedding"), pq, meta = Seq("label"))
    val nullMeta = VectorIndex.loadCodes(spark, path, meta = Seq("label"))
      .filter(col("label").isNull).count()
    assert(nullMeta == 0, "upsert on a metadata index must not null out metadata")
  }

  private def fsOf(path: String) = org.apache.hadoop.fs.FileSystem.get(
    new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
  private def hp(path: String, n: String) = new org.apache.hadoop.fs.Path(s"$path/$n")

  test("recoverCompaction: half-swap crashes roll forward (complete stage) or back (partial stage)") {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_recover").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    VectorIndex.write(quant,
      VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant), path)
    def answer() = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 4, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val healthy = answer()
    assert(healthy.nonEmpty)
    val fs = fsOf(path)

    // crash BETWEEN the two swap renames, stage COMPLETE (it carries the
    // parquet _SUCCESS commit marker): codes/ gone, data split across
    // codes_old/ and codes_compacting/ — recovery must roll FORWARD
    fs.rename(hp(path, "codes"), hp(path, "codes_compacting")) // complete stage incl. _SUCCESS
    fs.mkdirs(hp(path, "codes_old"))
    VectorIndex.recoverCompaction(spark, path)
    assert(fs.exists(hp(path, "codes")) && !fs.exists(hp(path, "codes_old")) &&
      !fs.exists(hp(path, "codes_compacting")), "roll-forward must restore exactly codes/")
    assert(answer() == healthy, "rolled-forward index must answer identically")

    // crash DURING staging (stage partial, no _SUCCESS) after codes was
    // renamed away — recovery must roll BACK to the old directory
    fs.rename(hp(path, "codes"), hp(path, "codes_old"))
    fs.mkdirs(hp(path, "codes_compacting"))
    val junk = fs.create(new org.apache.hadoop.fs.Path(hp(path, "codes_compacting"), "part-junk.parquet"), true)
    junk.write("partial".getBytes("UTF-8")); junk.close()
    VectorIndex.recoverCompaction(spark, path)
    assert(fs.exists(hp(path, "codes")) && !fs.exists(hp(path, "codes_old")) &&
      !fs.exists(hp(path, "codes_compacting")), "roll-back must restore exactly codes/")
    assert(answer() == healthy, "rolled-back index must answer identically")

    // debris with codes/ intact (crash before the swap began): just cleaned
    fs.mkdirs(hp(path, "codes_old"))
    fs.mkdirs(hp(path, "codes_compacting"))
    // compactCells itself runs recovery on entry — and then compacts fine
    VectorIndex.compactCells(spark, path)
    assert(!fs.exists(hp(path, "codes_old")) && !fs.exists(hp(path, "codes_compacting")))
    assert(answer() == healthy, "compaction after debris cleanup must not change answers")
  }

  test("upsertBatch crash window: re-running the same change batch converges from the worst intermediate state") {
    val path = java.nio.file.Files.createTempDirectory("graft_vindex_crash").toString
    val quant = VectorIndex.train(corpus, col("vec_id"), col("embedding"),
      kCells = 16, iters = 1, pq = pq)
    val codes = VectorIndex.encode(corpus, col("vec_id"), col("embedding"), quant)
    VectorIndex.write(quant, codes, path)
    // a change batch that fully tombstones one cell — the exact
    // stale-directory hazard of the documented crash window (a delete-only
    // batch, so nothing can legitimately re-land in the emptied cell)
    val someCell = codes.select("cell").head().getAs[Number](0).longValue
    val condemned = codes.filter(col("cell") === someCell && col("m") === 0).select("vec_id")
    val updates = corpus.limit(0).select(col("vec_id"), col("embedding"))

    // snapshot pre-upsert state of the pieces the crash would leave stale
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) { dst.mkdirs(); Option(src.listFiles()).toSeq.flatten
        .foreach(f => copyDir(f, new java.io.File(dst, f.getName))) }
      else java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_vindex_snap").toFile
    copyDir(new java.io.File(s"$path/codes/cell=$someCell"), new java.io.File(tmp, "cell"))
    copyDir(new java.io.File(s"$path/occupancy"), new java.io.File(tmp, "occupancy"))

    VectorIndex.upsertBatch(spark, path, updates, condemned,
      col("vec_id"), col("embedding"), pq)

    // SIMULATE the crash-after-overwrite state: the fully-tombstoned cell's
    // stale directory is back (delete step lost) and occupancy is the
    // pre-upsert table (replace step lost)
    copyDir(new java.io.File(tmp, "cell"), new java.io.File(s"$path/codes/cell=$someCell"))
    val fs = fsOf(path)
    fs.delete(hp(path, "occupancy"), true)
    copyDir(new java.io.File(tmp, "occupancy"), new java.io.File(s"$path/occupancy"))
    assert(VectorIndex.loadCodes(spark, path).filter(col("cell") === someCell).count() > 0,
      "fixture: the stale tombstoned cell must be serving again before recovery")

    // RECOVERY = re-run the exact same change batch; it must converge
    VectorIndex.upsertBatch(spark, path, updates, condemned,
      col("vec_id"), col("embedding"), pq)
    assert(!new java.io.File(s"$path/codes/cell=$someCell").exists(),
      "re-run must drop the stale emptied-cell directory")
    // no duplicate rows survived recovery: one code row per (vector, subspace)
    val dupRows = VectorIndex.loadCodes(spark, path)
      .groupBy("vec_id", "m").count().filter(col("count") > 1).count()
    assert(dupRows == 0, "recovery must not leave duplicated code rows")
    val post = corpus
      .join(condemned.withColumnRenamed("vec_id", "__del"),
        col("vec_id") === col("__del"), "left_anti")
      .select(col("vec_id"), col("embedding"))
    val rebuilt = VectorIndex.encode(post, col("vec_id"), col("embedding"), quant)
    val fromIndex = VectorIndex.searchAdc(VectorIndex.loadCodes(spark, path),
      VectorIndex.loadQuantizer(spark, path, pq), queries, nprobe = 16, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    val fromRebuild = VectorIndex.searchAdc(rebuilt, quant, queries, nprobe = 16, topK = 5)
      .orderBy("query_id", "rn").collect().toSeq
    assert(fromIndex == fromRebuild,
      "after recovery the index must answer exactly like the post-change rebuild")
    val occ = VectorIndex.occupancy(spark, path).orderBy("cell").collect().toSeq
    val recount = VectorIndex.cellOccupancy(VectorIndex.loadCodes(spark, path))
      .orderBy("cell").collect().toSeq
    assert(occ == recount, "occupancy must be consistent again after the re-run")
  }
}
