package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{argminL2, l2sq}

/** Product-quantization layout shared by every side of an IVFADC index:
  * `m` subspaces of `subDim` components each, `k` code words per subspace.
  */
final case class PqParams(m: Int, subDim: Int, k: Int)

/** A trained, FROZEN IVFADC quantizer: the coarse cell centroids
  * (`cents`: cent_id, cent) and the shared residual PQ codebook
  * (`csubs`: cent_id, m, centsub). Together with a codes table this is the
  * whole persistable state of the index — raw vectors are never stored.
  */
final case class IvfadcQuantizer(cents: DataFrame, csubs: DataFrame, pq: PqParams)

/** Persistable, APPENDABLE IVFADC vector index — the ANN dual of
  * [[Dedup.minHashIncrementalIndexed]] and the vector analogue of the
  * reference's incremental cursor sync (integrations/shopify/shopify.go:39-64
  * — scan only the new window, persist the cursor): train once on the
  * corpus, persist `(vec_id, cell, m, code)` + the quantizer to parquet,
  * then index each fresh batch by assigning + encoding UNDER THE FROZEN
  * QUANTIZER and appending its codes — the corpus is never re-read,
  * re-shuffled, or re-trained on the append path.
  *
  * Why this is sound: [[encode]] is row-wise (broadcast-argmin cell
  * assignment → broadcast centroid residual → broadcast-codebook subspace
  * argmin — the VECTOR side is a map-only pass with no shuffle; the only
  * shuffles in the plan are the tiny quantizer-build aggregations that sit
  * beneath their own broadcast build sides, spec-asserted), so
  * `encode(corpus) ∪ encode(batch)` under a frozen quantizer is exactly
  * `encode(corpus ∪ batch)` — an appended index answers queries
  * identically to a from-scratch encode of the combined corpus (the
  * `ann_ivfpq_append` oracle gate pins this cross-engine). What an append
  * canNOT do is improve the quantizer: cells and code words stay those of
  * the training corpus, the standard IVFADC contract (FAISS trains the
  * quantizer once and `add()`s batches under it; drift is handled by
  * periodic retrain + reindex, which here is just [[train]] + [[encode]]
  * over the new corpus).
  *
  * Scale shape: the codes table is ~`m` small ints per vector; [[write]]
  * lays it out partitioned by `cell`, so a search that probes `nprobe` of
  * `k` cells can prune to `nprobe/k` of the files. [[searchAdc]] touches
  * codes only — one shuffle, the per-(query, neighbor) ADC sum; the
  * quantizer (k + m·k rows) broadcasts everywhere.
  *
  * Conventions match the `ann_ivfpq_*` gates (graft.queries
  * .SimilarityQueries): residual encoding, argmin and rank ties broken on
  * id, fixed-order ADC association — so oracle determinism carries over.
  */
object VectorIndex extends org.apache.spark.internal.Logging {

  /** (idAs, carry…, m, sub): a vector frame exploded into its `m` subspace
    * slices — the one definition of the subspace layout (codebook, corpus
    * encode, and query sides all slice through here). Input must expose
    * `vec_id` and `embedding`.
    */
  private def subspaces(df: DataFrame, idAs: String, pq: PqParams,
      carry: Seq[String] = Nil): DataFrame = {
    val ms = array((0 until pq.m).map(lit(_)): _*)
    df.select(col("vec_id").as(idAs) +: carry.map(col) :+
        explode(ms).as("m") :+ col("embedding"): _*)
      .select(col(idAs) +: carry.map(col) :+ col("m") :+
        slice(col("embedding"), col("m") * pq.subDim + 1, lit(pq.subDim)).as("sub"): _*)
  }

  /** Element-wise residual x − cent(cell): broadcast k-row centroid join,
    * double arithmetic in array order (the oracle's list_transform order).
    */
  private def residuals(assigned: DataFrame, cents: DataFrame,
      carry: Seq[String] = Nil): DataFrame =
    assigned
      .join(broadcast(cents.select(col("cent_id").as("cell"), col("cent").as("__cent"))), "cell")
      .select(col("vec_id") +: col("cell") +:
        zip_with(col("embedding"), col("__cent"), (x, c) => x.cast("double") - c)
          .as("embedding") +: carry.map(col): _*)

  /** Codebook collapsed to one row per subspace (k sorted code words, so
    * ArgminL2's first-wins tie-break realizes `dist ASC, cent_id ASC`).
    */
  private def codebookOf(csubs: DataFrame): DataFrame = csubs
    .groupBy(col("m"))
    .agg(array_sort(collect_list(struct(col("cent_id"), col("centsub")))).as("__cs"))
    .select(col("m"),
      transform(col("__cs"), c => c.getField("cent_id")).as("__cids"),
      transform(col("__cs"), c => c.getField("centsub")).as("__csubs"))

  /** Train the quantizer on a corpus: k-means coarse cells
    * ([[KMeans.fit]]: seeded from the first `kCells` corpus rows by id,
    * fixed `iters`, deterministic) plus the shared residual codebook — the
    * residual sub-vectors of the first `pq.k` corpus rows (FAISS trains
    * one codebook pooled across cells). The codebook is localCheckpoint'd
    * (m·k rows) so its corpus-row scan runs once, not per consumer.
    */
  def train(corpus: DataFrame, id: Column, emb: Column,
      kCells: Int, iters: Int, pq: PqParams): IvfadcQuantizer = {
    val cents = KMeans.fit(corpus, id, emb, kCells, iters)
    val seeds = corpus.orderBy(id).limit(pq.k)
      .select(id.as("vec_id"), emb.as("embedding"))
    val assignedSeeds = Dedup.assignCells(seeds, col("vec_id"), col("embedding"), cents)
      .select(col("__id").as("vec_id"), col("cell"), col("__v").as("embedding"))
    val csubs = subspaces(residuals(assignedSeeds, cents), "cent_id", pq)
      .withColumnRenamed("sub", "centsub")
      .localCheckpoint()
    IvfadcQuantizer(cents, csubs, pq)
  }

  /** Encode vectors under a FROZEN quantizer → (vec_id, cell, m, code).
    * Row-wise: broadcast-argmin assignment, broadcast residual subtraction,
    * broadcast-codebook subspace argmin — the vector side reaches the output
    * without a shuffle; the quantizer-build aggregations (collect_list over
    * k centroids / m·k codebook rows) do shuffle, but only beneath their
    * BroadcastExchange build sides (VectorIndexSpec walks the plan and
    * asserts exactly this), which is what makes appends corpus-free.
    */
  def encode(vectors: DataFrame, id: Column, emb: Column,
      quant: IvfadcQuantizer): DataFrame =
    encode(vectors, id, emb, quant, Nil)

  /** [[encode]] carrying FILTERABLE METADATA columns (by name, from
    * `vectors`) onto every code row — the storage side of filtered ANN
    * search. Every production vector query rides with a predicate (source,
    * lang, date, licence); storing the metadata ON the code rows (repeated
    * per subspace — parquet RLE makes the repetition ~free) means a
    * filtered search evaluates the predicate INSIDE the codes scan, before
    * any ADC scoring, instead of post-filtering a top-k and starving. The
    * carry is a pure map-pass pass-through: no join, no shuffle — the
    * encode plan shape is unchanged (VectorIndexSpec's zero-exchange
    * assertion covers it).
    */
  def encode(vectors: DataFrame, id: Column, emb: Column,
      quant: IvfadcQuantizer, meta: Seq[String]): DataFrame = {
    val assigned = Dedup.assignCells(vectors, id, emb, quant.cents, meta)
      .select(col("__id").as("vec_id") +: col("cell") +:
        col("__v").as("embedding") +: meta.map(col): _*)
    subspaces(residuals(assigned, quant.cents, meta), "vec_id", quant.pq, "cell" +: meta)
      .join(broadcast(codebookOf(quant.csubs)), "m")
      .select(col("vec_id") +: col("cell") +: col("m") +:
        element_at(col("__cids"), argminL2(col("sub"), col("__csubs")) + 1).as("code") +:
        meta.map(col): _*)
  }

  /** ADC search over a codes table: probe the query's `nprobe` nearest
    * cells, compute the query's residual against EACH probed cell's
    * centroid, and rank candidates by the fixed-order sum over subspaces of
    * the exact distance to the neighbor's assigned code word. The corpus
    * side touches codes only; the single wide exchange is the
    * per-(query, neighbor) ADC sum.
    *
    * @param queries (query_id, q_emb) — raw query vectors
    */
  /** Top-`nprobe` cells per query: 1-row broadcast centroid array, sorted
    * (dist, cent_id) structs so array_sort's lexicographic order IS the
    * `ORDER BY dist ASC, cent_id ASC` tie-break of the oracle.
    * → (query_id, q_emb, cell), `nprobe` rows per query.
    */
  private def probeFrame(queries: DataFrame, cents: DataFrame, nprobe: Int): DataFrame = {
    val centArr = broadcast(cents
      .agg(array_sort(collect_list(struct(col("cent_id"), col("cent")))).as("__cs")))
    queries
      .crossJoin(centArr)
      .select(col("query_id"), col("q_emb"),
        explode(transform(
          slice(array_sort(transform(col("__cs"), c =>
            struct(l2sq(col("q_emb"), c.getField("cent")).as("dist"),
              c.getField("cent_id").as("cent_id")))), 1, nprobe),
          x => x.getField("cent_id"))).as("cell"))
  }

  def searchAdc(codes: DataFrame, quant: IvfadcQuantizer, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame = {
    val centsByCell = quant.cents.select(col("cent_id").as("cell"), col("cent").as("__cent"))
    val probed = probeFrame(queries, quant.cents, nprobe)
      .join(broadcast(centsByCell), "cell")
      .select(col("query_id").as("vec_id"), col("cell"),
        zip_with(col("q_emb"), col("__cent"), (x, c) => x.cast("double") - c)
          .as("embedding"))
    val qsubs = subspaces(probed, "query_id", quant.pq, Seq("cell"))
      .withColumnRenamed("sub", "qsub")
    val w = Window.partitionBy(col("query_id")).orderBy(col("est_dist").asc, col("neighbor_id"))
    // one conditional sum per subspace, then a FIXED-ORDER left-associated
    // addition — a plain sum() would merge terms in shuffle-fetch order and
    // a 1-ulp association difference between tied neighbors would defeat
    // the neighbor_id tie-break (same device as the ann_pq_adc gate)
    val terms = (0 until quant.pq.m).map(i =>
      sum(when(col("m") === i, col("term"))).as(s"t$i"))
    codes
      .join(broadcast(quant.csubs.withColumnRenamed("cent_id", "code")), Seq("m", "code"))
      .join(broadcast(qsubs), Seq("cell", "m"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("term", l2sq(col("qsub"), col("centsub")))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(terms.head, terms.tail: _*)
      .withColumn("est_dist", (0 until quant.pq.m).map(i => col(s"t$i")).reduce(_ + _))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("query_id"), col("neighbor_id"), round(col("est_dist"), 4).as("est_dist"),
        col("rn"))
  }

  /** [[searchAdc]] with the probed cell set PUSHED DOWN over a persisted,
    * cell-partitioned codes table ([[write]]'s layout): the distinct
    * probed cells — at most |queries|·nprobe ids, a bounded query-side
    * list, so the driver collect touches no corpus data — become an IN
    * partition filter, and only the probed cells' code files are even
    * opened (~nprobe/k of the index; VectorIndexSpec asserts the
    * partition filter reaches the scan and the surviving directory
    * count). Results are identical to [[searchAdc]]: every ADC candidate
    * joins on a probed cell, so un-probed cells can contribute nothing.
    */
  def searchAdcPruned(codes: DataFrame, quant: IvfadcQuantizer, queries: DataFrame,
      nprobe: Int, topK: Int): DataFrame =
    searchAdcPruned(codes, quant, queries, nprobe, topK, None)

  /** [[searchAdcPruned]] with a METADATA PREDICATE pushed into the codes
    * scan — filtered ANN serving. The predicate (over columns carried by
    * the metadata-aware [[encode]]) composes with the probed-cell
    * partition filter, so on a persisted index BOTH reach the parquet
    * reader: partition pruning opens only the probed cells' files, and the
    * predicate lands in PushedFilters / the scan's data filters
    * (spec-asserted) — candidates are eliminated BEFORE any ADC scoring
    * work. That is what makes a selective filtered query return its full
    * `topK`: the top-k window ranks ONLY predicate-matching candidates
    * from the probed cells, instead of post-filtering an unfiltered top-k
    * and starving toward <k rows. (Matches fewer than k in the probed
    * cells → fewer rows, like any ANN search; raise nprobe for recall.)
    */
  /** Observation name under which a PREDICATE-filtered pruned search
    * reports its top-k starvation: `returned` (result rows that
    * materialized) vs `expected` (queries × topK). A filtered search
    * silently returns <k per query when the probed cells hold too few
    * matches — the one remaining silent cap in the index; this is the
    * no-silent-caps accounting ([[Dedup.CapObservation]]'s discipline)
    * that makes it observable. Read with [[prunedShortfall]] after an
    * action on the returned frame. Unfiltered searches attach nothing
    * (they under-fill only when the probed cells themselves hold <k
    * vectors — the plain ANN recall trade, not a cap).
    */
  val ShortfallObservation = "ann_pruned_shortfall"

  def searchAdcPruned(codes: DataFrame, quant: IvfadcQuantizer, queries: DataFrame,
      nprobe: Int, topK: Int, predicate: Option[Column]): DataFrame = {
    // ONE bounded job (≤ queries × nprobe rows) serves both driver needs:
    // the distinct probed-cell set for the scan prune AND the query count
    // that pins the observation's expected total — no separate count job
    // on the queries source at frame-construction time.
    val probed = probeFrame(queries, quant.cents, nprobe)
      .agg(collect_set(col("cell")).as("cells"),
        countDistinct(col("query_id")).as("nq")).head()
    val cells = probed.getSeq[Any](0)
    val nQueries = probed.getLong(1)
    val pruned = codes.filter(col("cell").isin(cells: _*))
    val result = searchAdc(predicate.fold(pruned)(pruned.filter), quant, queries, nprobe, topK)
    predicate.fold(result) { _ =>
      // expected is well-defined even when EVERY query starves to zero rows
      // (count aggregates never null; 0·count keeps the expression
      // aggregate-legal). The observation name carries a per-call unique
      // suffix: Spark requires observed-metric names to be unique per plan,
      // and a composition of two filtered searches (union/join) would
      // otherwise fail analysis. prunedShortfall matches by prefix.
      val expected = nQueries * topK
      result.observe(
        s"$ShortfallObservation-${shortfallSeq.incrementAndGet()}",
        count(lit(1)).as("returned"),
        (lit(expected) + count(lit(1)) * 0L).as("expected"))
    }
  }
  private val shortfallSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Starvation accounting of an EXECUTED predicate-filtered
    * [[searchAdcPruned]] frame (run an action first — observed metrics
    * materialize with the action): Some(expected − returned), i.e. how many
    * of the queries×topK result slots the probed cells could not fill; None
    * if no filtered-search observation is in the plan or it has not
    * executed. A persistent nonzero shortfall under a selective predicate
    * is the raise-nprobe / partition-by-label signal.
    */
  def prunedShortfall(executed: DataFrame): Option[Long] = {
    // prefix-match: each filtered search stamps a unique-suffixed
    // observation (see searchAdcPruned); a plan composing several filtered
    // searches reports their SUMMED shortfall
    val shortfalls = executed.queryExecution.observedMetrics.collect {
      case (name, r)
          if name == ShortfallObservation ||
            name.startsWith(ShortfallObservation + "-") =>
        r.getAs[Number]("expected").longValue() -
          r.getAs[Number]("returned").longValue()
    }
    if (shortfalls.isEmpty) None else Some(shortfalls.sum)
  }

  /** Observation name carrying a widening search's attempt record:
    * `first_nprobe` / `first_shortfall` (the initial attempt) and
    * `widened_nprobe` (= first_nprobe when no widening was needed). Read
    * with [[wideningRecord]] after an action on the returned frame.
    */
  val WidenObservation = "ann_probe_widened"

  /** Starvation-DRIVEN probe widening — the documented response to a
    * nonzero [[prunedShortfall]] (r14 VERDICT #6), opt-in via this separate
    * entry point (plain [[searchAdcPruned]] callers keep the report-only
    * behavior). Runs the predicate-filtered pruned search at `nprobe` and
    * materializes it eagerly (localCheckpoint — the shortfall observation
    * only exists post-action); a zero shortfall returns that result with no
    * re-execution (the checkpoint serves the caller's action). A starved
    * attempt re-runs at `widenTo` probes — deliberately from scratch: the
    * widened probe set strictly contains the narrow one, but re-deriving
    * beats stitching partial per-cell rankings whose top-k windows differ.
    * Both attempts are accounted on the returned frame ([[Dedup]]'s
    * no-silent-work discipline, in reverse — no silent EXTRA cost either):
    * the widened run's own shortfall observation plus a
    * [[WidenObservation]] record of what the first attempt saw.
    *
    * At 100 TB the widening is per-QUERY-BATCH, not per-query: one starved
    * rare-label batch pays one extra bounded pruned scan (widenTo/k of the
    * index), while the common unfiltered/filled path never re-executes.
    */
  def searchAdcPrunedWidening(codes: DataFrame, quant: IvfadcQuantizer,
      queries: DataFrame, nprobe: Int, topK: Int, predicate: Column,
      widenTo: Int): DataFrame = {
    require(widenTo >= nprobe,
      s"widenTo ($widenTo) must be ≥ the initial nprobe ($nprobe)")
    def record(df: DataFrame, firstShortfall: Long, widened: Int): DataFrame =
      df.observe(s"$WidenObservation-${shortfallSeq.incrementAndGet()}",
        max(lit(nprobe)).as("first_nprobe"),
        max(lit(firstShortfall)).as("first_shortfall"),
        max(lit(widened)).as("widened_nprobe"))
    val first = searchAdcPruned(codes, quant, queries, nprobe, topK, Some(predicate))
    val materialized = first.localCheckpoint() // eager: one execution, reusable
    val starved = prunedShortfall(first).getOrElse(0L)
    if (starved == 0L || widenTo == nprobe)
      record(materialized, starved, nprobe)
    else {
      // the narrow attempt's checkpoint storage serves nothing downstream —
      // free it now rather than waiting on the ContextCleaner
      materialized.queryExecution.logical.foreach {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.unpersist(blocking = false); ()
        case _ => ()
      }
      record(
        searchAdcPruned(codes, quant, queries, widenTo, topK, Some(predicate)),
        starved, widenTo)
    }
  }

  /** The attempt record of an EXECUTED [[searchAdcPrunedWidening]] frame:
    * Some((firstNprobe, firstShortfall, widenedNprobe)); widenedNprobe ==
    * firstNprobe means the first attempt filled its top-k and nothing
    * widened. None when the frame carries no widening record or has not
    * executed.
    */
  def wideningRecord(executed: DataFrame): Option[(Int, Long, Int)] =
    executed.queryExecution.observedMetrics.collectFirst {
      case (name, r) if name.startsWith(WidenObservation + "-") =>
        (r.getAs[Number]("first_nprobe").intValue(),
          r.getAs[Number]("first_shortfall").longValue(),
          r.getAs[Number]("widened_nprobe").intValue())
    }

  /** Persist quantizer + codes. Codes are laid out partitioned by `cell`,
    * so a search probing `nprobe` of `k` cells can prune its scan to
    * `nprobe/k` of the files — the layout IS the coarse index on disk
    * ([[searchAdcPruned]] exploits exactly this). Also persists the
    * per-cell occupancy table (see [[cellOccupancy]]) so the index carries
    * its own skew accounting from birth.
    */
  def write(quant: IvfadcQuantizer, codes: DataFrame, path: String): Unit = {
    val s = codes.sparkSession
    withWriterLease(s, path, "write") {
      // settle a crashed-but-committed reindex FIRST: its promote rolling
      // forward AFTER this rebuild would overwrite the fresh index with the
      // stale staged build
      recoverReindex(s, path)
      val snap = snapshot(s, path)
      // A generation-managed index (≥1 committed swap) is rebuilt with the
      // same reader-atomic discipline as compact/split/reindex: stage the
      // full part set COMPLETE in the next generation's directories, then
      // flip the manifest in one commit — never overwrite the directories
      // the live manifest references in place, which a concurrent reader
      // resolving the live snapshot is still scanning. A fresh/legacy flat
      // index (gen 0, no manifest) writes flat, as ever.
      val managed = manifestGens(hadoopFs(s, path), path).nonEmpty
      val dirs: Map[String, String] =
        if (managed) indexParts.map(p => p -> stagedDirName(snap, p)).toMap
        else flatDirs
      def dst(part: String) = s"$path/${dirs(part)}"
      // a rebuild re-cells everything: the old sidecar mapping dies NOW
      // (absence = safe fallback through every crash window below) and is
      // rebuilt fresh from the written codes at the end
      hadoopFs(s, path).delete(idMapPath(path), true)
      quant.cents.write.mode("overwrite").parquet(dst("cents"))
      quant.csubs.write.mode("overwrite").parquet(dst("codebook"))
      // cluster by cell before the partitioned write: without it every input
      // task emits a file into every cell directory (tasks × cells small
      // files — measured as the dominant cost of the index build); with it
      // each cell's rows sit in one task → one file per cell, and every
      // later reload/prune opens k files instead of tasks·k
      codes.repartition(col("cell"))
        .write.mode("overwrite").partitionBy("cell").parquet(dst("codes"))
      // fresh directory: its schema marker is exactly what was written
      // (full-rows reads then skip the all-footers merge — see the marker's
      // section doc); written before the manifest commit publishes the dir
      writeSchemaMarker(s, dst("codes"), codes.schema)
      cellOccupancy(s.read.parquet(dst("codes"))
        .select(col("vec_id"), col("cell"), col("m"), col("code")))
        .write.mode("overwrite").parquet(dst("occupancy"))
      if (managed) commitParts(s, path, dirs)
      // an index born past the read threshold carries the discovery
      // sidecar from birth (the staged dir IS the live dir once the
      // manifest commits — no rename); smaller ones discover via the
      // full scan until they grow (see sidecarReadMinBytes lifecycle)
      if (codesBytes(s, dst("codes")) >= sidecarReadMinBytes)
        rebuildIdMapFrom(s, path, dst("codes"))
    }
  }

  def loadQuantizer(s: SparkSession, path: String, pq: PqParams): IvfadcQuantizer =
    loadQuantizer(s, snapshot(s, path), pq)

  /** [[loadQuantizer]] against an already-resolved generation — the
    * consistent-read path: pair with [[loadCodes]] on the SAME snapshot and
    * the two parts are guaranteed to belong to one committed generation.
    */
  def loadQuantizer(s: SparkSession, snap: IndexSnapshot,
      pq: PqParams): IvfadcQuantizer =
    IvfadcQuantizer(
      s.read.parquet(snap.partPath("cents")),
      s.read.parquet(snap.partPath("codebook")), pq)

  def loadCodes(s: SparkSession, path: String): DataFrame =
    loadCodes(s, path, Nil)

  /** [[loadCodes]] keeping named metadata columns (stored by the
    * metadata-aware [[encode]]) alongside the search schema — the read
    * side of filtered ANN serving. Projection stays explicit so a search
    * never drags ingest bookkeeping (`__batch`/`__stream`) into its scan.
    */
  def loadCodes(s: SparkSession, path: String, meta: Seq[String]): DataFrame =
    loadCodes(s, snapshot(s, path), meta)

  /** [[loadCodes]] against an already-resolved generation (see
    * [[loadQuantizer]]'s snapshot overload).
    */
  def loadCodes(s: SparkSession, snap: IndexSnapshot,
      meta: Seq[String] = Nil): DataFrame =
    s.read.parquet(snap.partPath("codes"))
      .select(col("vec_id") +: col("cell") +: col("m") +: col("code") +:
        meta.map(col): _*)

  /** Index a fresh batch into a persisted index: encode under the FROZEN
    * stored quantizer and append the codes — the persisted corpus codes are
    * untouched and the corpus itself is never read. The daily-ingest path.
    * Occupancy is maintained INCREMENTALLY (old per-cell counts + the fresh
    * batch's), so the accounting stays corpus-free too.
    */
  def appendBatch(s: SparkSession, path: String, fresh: DataFrame,
      id: Column, emb: Column, pq: PqParams): Unit =
    withWriterLease(s, path, "appendBatch") {
      // settle a crashed-but-committed reindex FIRST (same hazard as
      // appendSink): appending into the superseded generation loses the
      // batch when the promote later rolls forward and GC's it
      recoverReindex(s, path)
      appendCodes(s, path, fresh, id, emb, pq, stamp = None, streamId = None)
    }

  /** THE ingest sequence, shared by the batch ([[appendBatch]]) and
    * streaming ([[appendSink]]) paths so the two can never drift: encode
    * under the frozen stored quantizer, cell-cluster BEFORE the eager
    * checkpoint (the append then reuses the materialized layout — one new
    * file per touched cell per batch, not one per (task, cell), with no
    * second pass), append, fold the occupancy delta, and — for stamped
    * streaming batches — advance the replay high-water mark LAST, so the
    * marker always trails the durable data.
    */
  private def appendCodes(s: SparkSession, path: String, vectors: DataFrame,
      id: Column, emb: Column, pq: PqParams, stamp: Option[Long],
      streamId: Option[String]): Unit = {
    val snap = snapshot(s, path)
    val quant = loadQuantizer(s, snap, pq)
    val encoded = encode(vectors, id, emb, quant)
    val stamped = stamp.fold(encoded)(b => encoded.withColumn("__batch", lit(b)))
    val codes = streamId.fold(stamped)(sid => stamped.withColumn("__stream", lit(sid)))
      .repartition(col("cell")).localCheckpoint()
    // sidecar first (crash between the two leaves harmless extra entries —
    // appendIdMap's invariant), then the codes append
    appendIdMap(s, path, codes)
    // schema marker widened BEFORE the data lands (superset-first): a
    // stamped batch appended without the marker knowing its columns would
    // silently lose the stamps to every later explicit-schema read
    widenSchemaMarker(s, snap.partPath("codes"), codes.schema)
    codes.write.mode("append").partitionBy("cell").parquet(snap.partPath("codes"))
    mergeOccupancy(s, path, cellOccupancy(codes))
    stamp.foreach(writeAppliedBatch(s, path, _, streamId))
  }

  // ---- deletes / updates -------------------------------------------------

  /** Apply a change batch (updated vectors + deleted ids) onto a PERSISTED
    * index — the vector dual of [[Upsert.mergeLargeBase]] and of the
    * reference's incremental model, where a sync window carries updates,
    * not just inserts (integrations/shopify/shopify.go:39-64 re-syncs
    * *changed* rows). Under the frozen stored quantizer:
    *
    *   - only the CHANGED vectors are re-encoded ([[encode]] — map-only on
    *     the vector side, broadcast quantizer);
    *   - the corpus codes are split by broadcasting the (small) changed-id
    *     set — never re-encoded; the only shuffle is the cell-clustering of
    *     the TOUCHED partitions' rewrite, bounded by touched data, never
    *     the corpus;
    *   - only the TOUCHED cell partitions are rewritten (the old cells of
    *     changed ids ∪ the new cells of updated vectors — an update may
    *     move a vector between cells), via dynamic partition overwrite;
    *     untouched cells keep their files byte-for-byte.
    *
    * Equivalence contract (the `ann_ivfpq_upsert` oracle gate pins it
    * cross-engine): after the upsert, the index answers exactly like a
    * from-scratch encode of (corpus − deleted) ∪ updated under the same
    * frozen quantizer — because [[encode]] is row-wise, removing rows and
    * re-encoding changed rows commutes with encoding the final corpus.
    *
    * An id appearing in both `updates` and `deletes` is treated as
    * UPDATED (the update carries newer content — last-write-wins, the
    * [[Upsert]] convention). An updated id absent from the index is an
    * insert. Bounded driver state: only cell ids (≤ |changes| + k values)
    * are ever collected; the rewritten partitions are materialized via
    * localCheckpoint (bounded by touched-cell codes + the change batch)
    * before the overwrite so the write never reads the path it replaces.
    *
    * CRASH WINDOW (documented, with a converging recovery): the upsert is
    * three mutations — (1) dynamic-overwrite of touched cell partitions,
    * (2) delete of fully-emptied cell directories, (3) occupancy replace —
    * and a crash between them leaves (after 1) a fully-tombstoned cell's
    * stale directory still serving its deleted vectors, or (after 2) a
    * stale occupancy. Recovery is to RE-RUN THE SAME CHANGE BATCH: the
    * touched-cell set is re-derived from whatever rows currently match
    * `changedIds` (the stale emptied cell still holds its deleted ids, so
    * it re-enters `touched`, survives with zero rows, and step 2 drops its
    * directory), the overwrite is idempotent, and the occupancy replace
    * recounts the touched cells — so one clean re-run converges the index
    * to the exact post-upsert state (spec-pinned from the worst
    * intermediate state in VectorIndexSpec). Occupancy alone can also be
    * restored at any time by [[refreshOccupancy]]. Single-writer op, like
    * all maintenance here.
    *
    * @param updates frame exposing `id`/`emb` — changed or new vectors
    * @param deletes single-column frame of ids to remove (tombstones)
    */
  def upsertBatch(s: SparkSession, path: String, updates: DataFrame,
      deletes: DataFrame, id: Column, emb: Column, pq: PqParams): Unit =
    upsertBatch(s, path, updates, deletes, id, emb, pq, Nil)

  /** [[upsertBatch]] for a METADATA-CARRYING index: `meta` names the
    * filterable columns the index was encoded with (see the metadata-aware
    * [[encode]]) — they must be present on `updates` so rewritten rows
    * keep their metadata (a plain upsert on such an index would null the
    * updated rows' metadata and silently exempt them from every filtered
    * search).
    */
  def upsertBatch(s: SparkSession, path: String, updates: DataFrame,
      deletes: DataFrame, id: Column, emb: Column, pq: PqParams,
      meta: Seq[String]): Unit =
    withWriterLease(s, path, "upsertBatch") {
      // settle a crashed-but-committed reindex FIRST: an upsert applied to
      // the superseded generation silently vanishes when the promote later
      // rolls forward
      recoverReindex(s, path)
      upsertCore(s, path, updates, deletes, id, emb, loadQuantizer(s, path, pq), meta)
    }

  /** [[upsertBatch]] under a caller-supplied quantizer instead of the
    * stored one — the seam [[splitCell]] rides (it re-encodes a hot cell's
    * members under the POST-SPLIT centroid table before that table is
    * persisted). Everything else — touched-cell discovery, dynamic
    * partition overwrite, emptied-cell cleanup, occupancy — is the one
    * shared implementation, so the split path can never drift from the
    * upsert contract.
    */
  private def upsertCore(s: SparkSession, path: String, updates: DataFrame,
      deletes: DataFrame, id: Column, emb: Column, quant: IvfadcQuantizer,
      meta: Seq[String]): Unit = {
    val delIds = deletes.select(deletes.columns.head).toDF("vec_id")
    val updIds = updates.select(id.as("vec_id"))
    // materialized once (r18, the memberIds discipline): the changed-id set
    // is consumed by THREE actions — the touched-cell discovery, the sidecar
    // probe, and the survivors anti-join inside the rewrite checkpoint — and
    // each would otherwise re-scan the caller's updates/deletes sources and
    // re-run the distinct shuffle. Bounded by the change batch, like the
    // broadcast it feeds; dropped as soon as the rewrite materializes.
    val changedIds = updIds.union(delIds).distinct().localCheckpoint()
    val newCodes = encode(updates, id, emb, quant, meta).localCheckpoint()
    val codes = loadCodesFull(s, path)
    // Touched-cell set = the old cells of changed ids ∪ the new cells of
    // updated vectors (an update may move a vector between cells). The old
    // half goes through the id→cell sidecar when present (VERDICT r15 #4:
    // the full-codes discovery scan was the one per-batch full index pass —
    // at 100 TB a full pass per micro-batch), reading only the changed
    // ids' hash-bucket directories; the survivors read below is then
    // partition-pruned to the touched cells, so the whole upsert reads
    // touched-cell-order bytes. One action for the cell set itself (plus,
    // on the sidecar path, one tiny bucket-enumeration action over the
    // change batch).
    val touched = oldCellsOf(s, path, codes, changedIds)
      .union(newCodes.select(col("cell")))
      .distinct().collect().map(_.get(0)).toSeq
    if (touched.isEmpty) { // empty change batch
      Dedup.dropLocalCheckpoint(changedIds)
      Dedup.dropLocalCheckpoint(newCodes)
      return
    }
    // sidecar first, then the codes mutation: a crash between the two
    // leaves only harmless extra entries (see appendIdMap's invariant)
    appendIdMap(s, path, newCodes)
    val survivors = codes.filter(col("cell").isin(touched: _*))
      .join(broadcast(changedIds), Seq("vec_id"), "left_anti")
    // unionByName(allowMissing): a streaming-ingested index carries __batch
    // stamps; upserted rows get null there. Replay detection survives this
    // (and survives deleting max-stamped rows outright) because the
    // `applied_batch` high-water marker, not the data-derived max alone,
    // is the primary exactly-once record — see batchApplied. Cell-clustered
    // BEFORE the eager checkpoint, so the partitioned write below reuses
    // the materialized layout (one file per cell) without a second pass —
    // and all reads of the path finish before the overwrite.
    val rewritten = survivors.unionByName(newCodes, allowMissingColumns = true)
      .repartition(col("cell"))
      .localCheckpoint()
    Dedup.dropLocalCheckpoint(changedIds) // consumed by the rewrite above
    Dedup.dropLocalCheckpoint(newCodes)   // folded into the rewrite above
    val codesDir = snapshot(s, path).partPath("codes")
    // marker widened BEFORE the rewrite (superset-first; a metadata-carrying
    // upsert on a bare index may add columns). `rewritten` was built from
    // the marker-resolved full read ∪ the new codes, so its schema IS the
    // union — no re-derivation (and no legacy footer pass) needed here.
    writeSchemaMarker(s, codesDir, rewritten.schema)
    rewritten.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cell").parquet(codesDir)
    // ONE pass over the checkpointed rewrite serves two consumers: the
    // per-cell counts are the touched cells' new occupancy AND their cell
    // set is the survivor set (≤ |touched| rows — bounded driver state)
    val occAfter = cellOccupancy(rewritten).collect()
    // dynamic overwrite only replaces partitions PRESENT in the new data —
    // a cell whose every vector was deleted writes no rows, so its stale
    // directory must be dropped explicitly
    val cellsAfter = occAfter.map(_.get(0)).toSet
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), s.sparkContext.hadoopConfiguration)
    touched.filterNot(cellsAfter).foreach { c =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$codesDir/cell=$c"), true)
    }
    // occupancy: untouched cells keep their counts; touched cells take the
    // already-collected recounts (a LocalRelation — no extra scan)
    val occ = occupancy(s, path)
    val occDelta = s.createDataFrame(
      java.util.Arrays.asList(occAfter: _*), cellOccupancy(rewritten).schema)
    mergeOccupancy(s, path,
      occ.filter(!col("cell").isin(touched: _*)).unionByName(occDelta),
      replace = true)
  }

  // ---- id→cell discovery sidecar ------------------------------------------

  /** Hash-bucket count of the discovery sidecar. Bounded and fixed: a
    * change batch of n ids touches at most min(n, IdMapBuckets) bucket
    * directories, so discovery reads ~min(n, B)/B of the sidecar instead
    * of the whole codes table.
    */
  private[graft] val IdMapBuckets = 64

  private def idMapDir(path: String) = s"$path/idmap"
  private def idMapPath(path: String) =
    new org.apache.hadoop.fs.Path(idMapDir(path))

  /** Below this codes-directory size the sidecar does not exist AT ALL:
    * the legacy full-codes discovery scan is one cheap broadcast semi-join
    * at these sizes, while maintaining the sidecar costs one parquet write
    * job per mutation — measured as the bulk of a ~1.3× structural
    * regression on the sf0.1 mutation gates (VERDICT r16 #3). So small
    * indexes skip the build at birth, mutations DROP a sidecar they find
    * below the threshold (always safe: absence falls back to the full
    * scan), and the first mutation of an index grown past DOUBLE the
    * threshold restores it wholesale under the mutation's writer lease —
    * one amortized rebuild at the crossing, zero recurring cost below it.
    * The 1×-2× hysteresis band keeps a borderline index from churning
    * delete/rebuild. Overridable for tests/tuning via
    * -Dgraft.sidecar.read.min.bytes.
    */
  private[graft] def sidecarReadMinBytes: Long =
    sys.props.get("graft.sidecar.read.min.bytes").flatMap(_.toLongOption)
      .getOrElse(64L << 20)

  /** Sidecar-restore grade: an ABSENT sidecar is rebuilt by the next
    * mutation once the codes directory reaches this size. */
  private def sidecarRestoreBytes: Long = {
    val t = sidecarReadMinBytes
    if (t > Long.MaxValue / 2) Long.MaxValue else 2 * t
  }

  /** Driver-side size of an index part directory (one getContentSummary
    * RPC on a real DFS; a local walk on RawLocalFileSystem). Missing dir
    * reads as 0 — callers treat that as "small".
    */
  private def dirBytes(s: SparkSession, dir: String): Long =
    try hadoopFs(s, dir)
      .getContentSummary(new org.apache.hadoop.fs.Path(dir)).getLength
    catch { case _: java.io.IOException => 0L }

  /** Codes directories once measured at restore grade: the walk is skipped
    * forever after for them (a directory that large only grows in the
    * window that matters, and shrinking back below merely keeps the
    * sidecar route — correct either way). Bounds the per-mutation size
    * probe to small-index cases, where the walk is trivially cheap; on a
    * real DFS a 100 TB index pays exactly one recursive listing per
    * (process, generation).
    */
  private val bigCodesDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Size of a codes dir for the sidecar lifecycle decisions, with the
    * sticky big-verdict cache. */
  private def codesBytes(s: SparkSession, codesDir: String): Long =
    if (bigCodesDirs.contains(codesDir)) Long.MaxValue
    else {
      val b = dirBytes(s, codesDir)
      if (b >= sidecarRestoreBytes) { bigCodesDirs.add(codesDir); () }
      b
    }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  /** Canonical id column for sidecar bucket routing: xxhash64(int) !=
    * xxhash64(long), so a bucket hash computed from whatever physical
    * integral type a batch ARRIVES with would scatter one id's entries
    * across different buckets than a later probe computes — a silent
    * missing-entry window in the superset invariant (ADVICE r16). Integral
    * ids are therefore cast to long BEFORE hashing and storing; the read
    * side probes as long whenever the stored type is integral. Non-integral
    * id types pass through unchanged: for those the arrival type is the
    * id's one stable type (a cross-type arrival would already fail the
    * vec_id equi-join itself).
    */
  private def canonicalVecId(df: DataFrame): Column =
    if (isIntegral(df.schema("vec_id").dataType)) col("vec_id").cast("long")
    else col("vec_id")

  /** Sidecar rows for a codes frame: one (vec_id, cell, bucket) entry per
    * vector. `cell` is normalized to long — the codes frame sometimes
    * carries it partition-directory-inferred (int), and mixed physical
    * types across one parquet directory's files would corrupt later reads.
    * `vec_id` is normalized to its canonical type ([[canonicalVecId]]) so
    * bucket routing never depends on a batch's arrival type.
    */
  private def idMapEntries(codes: DataFrame): DataFrame = {
    val canon = codes.filter(col("m") === 0)
      .select(canonicalVecId(codes).as("vec_id"), col("cell").cast("long").as("cell"))
    canon.withColumn("bucket", pmod(xxhash64(col("vec_id")), lit(IdMapBuckets.toLong)))
  }

  /** Write shaping for sidecar entries: cluster by bucket so each bucket
    * directory gets ONE file per write and the ≤[[IdMapBuckets]] parquet
    * writer initializations spread across tasks. The r16 direct write (no
    * shuffle) opened up to tasks×buckets files; a coalesce(1) variant
    * (tried r17) serialized all writer inits in one task and measurably
    * REGRESSED reindex at sf0.1 — the file-count/parallelism balance, not
    * the task count, is what the write pays for.
    */
  private def idMapWriteShape(entries: DataFrame): DataFrame =
    entries.repartition(col("bucket")).sortWithinPartitions("vec_id")

  /** Change batches up to this many distinct ids ship the ids THEMSELVES
    * into the sidecar read as an isin predicate (beyond it: broadcast
    * semi-join). With bucket files sorted by vec_id ([[idMapWriteShape]])
    * the predicate reaches parquet row-group statistics, so a micro-batch
    * probe reads only the row groups covering its ids — sub-BUCKET pruning
    * once buckets outgrow one row group (a 100 TB index's buckets are GBs;
    * the bucket directories alone stop being enough). Driver state is
    * bounded by the cap (~10k ids ≈ a few hundred KB).
    */
  private[graft] val IdProbeCap = 10000

  /** Maintain the sidecar for a mutation's new (id → cell) mappings — MUST
    * run BEFORE the codes mutation it describes commits, so the sidecar's
    * invariant (when present, it is a SUPERSET of the live codes' id→cell
    * mapping — stale extra entries allowed, missing entries never)
    * survives every crash window: a sidecar append whose codes mutation
    * then died leaves only harmless extra entries.
    *
    * Size lifecycle (see [[sidecarReadMinBytes]]): below the threshold the
    * sidecar is DROPPED rather than maintained (absence is always safe and
    * the full-scan discovery is cheaper than the upkeep); at restore grade
    * an absent sidecar is rebuilt wholesale from the current codes —
    * rebuild-then-append keeps both writes ahead of the codes commit, so
    * the ordering invariant holds through the restore too. Callers hold
    * the writer lease (every mutation path does).
    */
  private def appendIdMap(s: SparkSession, path: String, codes: DataFrame): Unit = {
    val fs = hadoopFs(s, path)
    val codesDir = snapshot(s, path).partPath("codes")
    val bytes = codesBytes(s, codesDir)
    val present = fs.exists(idMapPath(path))
    if (bytes < sidecarReadMinBytes) {
      if (present) { fs.delete(idMapPath(path), true); () }
    } else if (present || bytes >= sidecarRestoreBytes) {
      if (!present) rebuildIdMapFrom(s, path, codesDir) // one-time restore
      idMapWriteShape(idMapEntries(codes)).write.mode("append")
        .partitionBy("bucket").parquet(idMapDir(path))
    } // absent in the 1x-2x hysteresis band: stays absent, reads fall back
  }

  /** Rebuild the sidecar wholesale from a codes directory: stage, drop the
    * old sidecar, rename into place. Every crash window is safe because
    * ABSENCE is safe (discovery falls back to the full codes scan) — a
    * half-staged build is debris the next rebuild overwrites, and the
    * delete→rename gap leaves no sidecar at all.
    */
  /** @param mergeSchema pay the all-footers schema merge only on the
    *   public legacy-fold path ([[rebuildIdMap]]), where the codes dir may
    *   be arbitrary debris; the internal callers (write/reindex/compact)
    *   rebuild from codes THEY just wrote — uniform by construction, and
    *   the rebuild projects only (vec_id, cell, m), which every codes file
    *   of every generation carries.
    */
  private def rebuildIdMapFrom(s: SparkSession, path: String,
      codesDir: String, mergeSchema: Boolean = false): Unit = {
    val fs = hadoopFs(s, path)
    val staging = new org.apache.hadoop.fs.Path(s"$path/idmap_staging")
    fs.delete(staging, true)
    idMapWriteShape(idMapEntries(
      (if (mergeSchema) codesFullSchemaRead(s, codesDir) // marker skips footers
       else s.read.parquet(codesDir))
        .select(col("vec_id"), col("cell"), col("m"))))
      .write.mode("overwrite").partitionBy("bucket").parquet(staging.toString)
    fs.delete(idMapPath(path), true)
    if (!fs.rename(staging, idMapPath(path)))
      throw new java.io.IOException(s"idmap rebuild at $path: rename failed")
  }

  /** (Re)build the id→cell discovery sidecar of a persisted index — the
    * opt-in for an index created before the sidecar existed (everything
    * [[write]]/[[reindex]] builds carries it from birth), and the fold
    * that trims the append-only growth of stale entries.
    */
  def rebuildIdMap(s: SparkSession, path: String): Unit =
    withWriterLease(s, path, "rebuildIdMap") {
      recoverReindex(s, path)
      rebuildIdMapFrom(s, path, snapshot(s, path).partPath("codes"),
        mergeSchema = true)
    }

  /** Observable record of the last touched-cell discovery (test seam): did
    * it go through the sidecar, and how many of its bucket directories were
    * actually read.
    */
  private[graft] final case class UpsertDiscovery(usedSidecar: Boolean,
      bucketsRead: Int, totalBuckets: Int)
  @volatile private[graft] var lastUpsertDiscovery: Option[UpsertDiscovery] = None

  /** The OLD cells of a change batch's ids — the expensive half of
    * touched-cell discovery. With the sidecar present this reads ONLY the
    * bucket directories the changed ids hash into (enumerated explicitly,
    * so the pruning holds by construction, not by optimizer grace) and may
    * return a SUPERSET of the true old cells (stale append-only entries):
    * a stale touched cell is rewritten identically by the dynamic
    * overwrite — pure write amplification, never wrong answers. Without
    * the sidecar: the legacy full codes scan (one broadcast semi-join).
    */
  private def oldCellsOf(s: SparkSession, path: String, codes: => DataFrame,
      changedIds: DataFrame): DataFrame = {
    val fs = hadoopFs(s, path)
    val codesDir = snapshot(s, path).partPath("codes")
    val bytes = codesBytes(s, codesDir)
    val sidecar: Option[DataFrame] =
      // size bypass (VERDICT r16 #3): under the threshold the full scan IS
      // the cheap path — one broadcast semi-join folded into the touched-
      // cell action, vs a footer read + an extra bucket-enumeration job
      // (and below it the sidecar is not maintained at all)
      if (bytes < sidecarReadMinBytes) None
      else if (!fs.exists(idMapPath(path))) {
        if (bytes < sidecarRestoreBytes) None // hysteresis band: fall back
        else {
          // threshold crossing (or an operator-deleted sidecar on a large
          // index): restore once, under the caller's writer lease — the
          // alternative is a full codes scan on EVERY future micro-batch
          rebuildIdMapFrom(s, path, codesDir)
          readIdMap(s, path, changedIds)
        }
      }
      else readIdMap(s, path, changedIds)
    sidecar.getOrElse {
      lastUpsertDiscovery =
        Some(UpsertDiscovery(usedSidecar = false, IdMapBuckets, IdMapBuckets))
      codes.join(broadcast(changedIds), Seq("vec_id"), "left_semi")
        .select(col("cell"))
    }
  }

  /** The sidecar read route of [[oldCellsOf]]: probe the changed ids'
    * bucket directories. None = unreadable/legacy sidecar → caller falls
    * back to the full scan (absence semantics).
    */
  private def readIdMap(s: SparkSession, path: String,
      changedIds: DataFrame): Option[DataFrame] = {
    val fs = hadoopFs(s, path)
    val dir = idMapDir(path)
    try {
        // bucket hashes must agree between write and read. Writes are
        // canonical ([[canonicalVecId]]): integral ids stored and hashed as
        // long. A sidecar whose stored type is integral-but-not-long
        // predates canonicalization (or holds mixed-type debris) — its
        // entries may sit under arrival-type hashes this probe cannot
        // reproduce, so it is treated as ABSENT (always safe) until
        // [[rebuildIdMap]] folds it to canonical form.
        val storedDt = s.read.parquet(dir).schema("vec_id").dataType
        if (isIntegral(storedDt) &&
            storedDt != org.apache.spark.sql.types.LongType) None
        else {
          val probe = changedIds.select(col("vec_id").cast(storedDt).as("vec_id"))
          // ONE action yields the bucket set (directory pruning) and — for
          // micro-batch-sized sets — the ids themselves, shipped back as an
          // isin predicate so row-group statistics prune WITHIN the sorted
          // bucket files (see IdProbeCap). An over-cap batch recomputes
          // just the buckets and keeps the broadcast semi-join.
          val pairs = probe
            .select(col("vec_id"),
              pmod(xxhash64(col("vec_id")), lit(IdMapBuckets.toLong)).as("b"))
            .distinct().limit(IdProbeCap + 1).collect()
          val small = pairs.length <= IdProbeCap
          val buckets =
            if (small) pairs.map(_.getLong(1)).distinct.toSeq
            else probe
              .select(pmod(xxhash64(col("vec_id")), lit(IdMapBuckets.toLong)).as("b"))
              .distinct().collect().map(_.getLong(0)).toSeq
          // ONE directory listing instead of a per-bucket exists probe
          // (ADVICE r16): the present bucket set in a single fs call
          val present =
            try fs.listStatus(idMapPath(path)).iterator
              .map(_.getPath.getName).toSet
            catch { case _: java.io.IOException => Set.empty[String] }
          val bucketDirs = buckets.filter(b => present.contains(s"bucket=$b"))
            .map(b => s"$dir/bucket=$b")
          lastUpsertDiscovery =
            Some(UpsertDiscovery(usedSidecar = true, bucketDirs.length, IdMapBuckets))
          if (bucketDirs.isEmpty)
            Some(probe.limit(0).select(lit(0L).as("cell")))
          else {
            val scan = s.read.option("basePath", dir)
              .parquet(bucketDirs.toIndexedSeq: _*)
            val matched =
              if (small) scan.filter(col("vec_id").isin(pairs.map(_.get(0)): _*))
              else scan.join(broadcast(probe), Seq("vec_id"), "left_semi")
            Some(matched.select(col("cell")))
          }
        }
      } catch { case _: org.apache.spark.sql.AnalysisException =>
        None // unreadable/empty sidecar: fall back, loudly observable below
      }
  }

  /** Bench/test seam: run ONLY the touched-cell discovery of a change
    * batch — the phase the sidecar exists to prune — and return the old
    * cells. [[graft.UpsertBench]] meters this in isolation because inside a
    * full upsert the discovery delta drowns in the (route-independent)
    * encode/rewrite/occupancy fixed costs.
    */
  private[graft] def discoverOldCells(s: SparkSession, path: String,
      changedIds: DataFrame): Seq[Any] =
    oldCellsOf(s, path, loadCodesFull(s, path), changedIds)
      .distinct().collect().map(_.get(0)).toSeq

  // ---- streaming ingest ---------------------------------------------------

  /** `foreachBatch` sink that grows a persisted index per micro-batch — the
    * streaming dual of [[appendBatch]] and the vector analogue of
    * [[graft.streaming.StreamingDedup.incrementalSink]]: each batch's
    * vectors are encoded under the FROZEN stored quantizer (map-only on
    * the vector side) and appended to the cell-partitioned codes layout,
    * stamped with the batch id. The corpus is never re-read on the ingest
    * path.
    *
    * Restart semantics: `foreachBatch` replays an in-flight batch on
    * recovery; a replayed batch is detected via the `applied_batch`
    * high-water marker (O(1), advanced only after the append lands, so it
    * never claims an unapplied batch and — unlike a data-derived max —
    * cannot regress when [[upsertBatch]] later rewrites or deletes
    * max-stamped rows), with the appended rows' own `__batch` stamps as
    * the fallback authority for the marker-write crash window — idempotent
    * per batch id, the same device as the dedup sink's docs stamps. [[loadCodes]] projects `__batch` away, so search
    * is oblivious to how rows arrived, and [[compactCells]] preserves the
    * stamps, so replay detection survives compaction.
    *
    * Occupancy is merged incrementally AFTER the codes append; a crash
    * exactly between the two leaves occupancy under-counted for that batch
    * (the replay skips it wholesale) — occupancy is an accounting signal,
    * not a correctness surface, and [[refreshOccupancy]] recounts it from
    * the codes at any time.
    *
    * STREAM IDENTITY (required for multi-lineage safety): `foreachBatch`
    * batch ids are scoped to a CHECKPOINT LINEAGE and restart at 0 when a
    * stream is re-created with a new checkpoint location — without an
    * identity, every batch of the new lineage would compare <= the old
    * lineage's high-water mark and be silently skipped (data loss). Pass a
    * stable `streamId` per checkpoint lineage (the idempotent-sink
    * convention of scoping the txn marker by (appId, version)): the marker
    * is kept per stream (`applied_batch_<streamId>`) and the rows' replay
    * stamps carry `__stream`, so both detection layers compare only
    * against their own lineage — a fresh lineage starts from a clean
    * marker and nothing is skipped. `streamId = None` keeps the legacy
    * single-marker behavior and is safe ONLY while the index is fed by
    * exactly one checkpoint lineage for its whole life.
    *
    * @param batchCap optional per-batch row cap (no-silent-caps: refused
    *   rows are counted into `capDrops`, the accumulator pattern of
    *   [[graft.streaming.StreamingDedup.nearDupCandidates]]); None admits
    *   everything
    * AUTO-COMPACTION (the flush-at-threshold policy the reference applies
    * to its own buffers — pkg/integ buffered writers flush when full):
    * every micro-batch appends one small file to each touched cell, so a
    * long-lived stream degrades the pruned serve from opening ~nprobe
    * files to ~nprobe × batches. With `autoCompactFilesPerCell = Some(n)`,
    * the sink measures the fragmentation AFTER each applied batch (one
    * filesystem listing of the codes tree — the same metadata walk every
    * scan's planning performs) and runs [[compactCells]] when any cell
    * exceeds `n` files, restoring 1 file/cell. Answers are unchanged and
    * the `__batch`/`__stream` replay stamps survive (compaction preserves
    * every column), so exactly-once detection is oblivious to when
    * compactions happened. Ordering: compaction runs after the batch's
    * marker write, so a crash mid-compaction loses no append — the next
    * entry rolls the half-swap forward or back ([[recoverCompaction]]).
    * Inherits compactCells' single-writer window: concurrent readers
    * during the brief swap are unsafe, same as any in-place parquet
    * rewrite — schedule reads off the ingest path or accept the
    * recovery call.
    *
    * @param batchCap optional per-batch row cap (no-silent-caps: refused
    *   rows are counted into `capDrops`, the accumulator pattern of
    *   [[graft.streaming.StreamingDedup.nearDupCandidates]]); None admits
    *   everything
    * @param streamId stable identity of the feeding checkpoint lineage —
    *   scopes replay detection so independent lineages (or a restart with
    *   a fresh checkpoint dir under a new id) never mask each other
    * @param autoCompactFilesPerCell compact back to 1 file/cell whenever a
    *   cell exceeds this many files; None (default) never compacts
    */
  def appendSink(path: String, pq: PqParams, id: Column, emb: Column,
      batchCap: Option[Int] = None,
      capDrops: Option[org.apache.spark.util.LongAccumulator] = None,
      streamId: Option[String] = None,
      autoCompactFilesPerCell: Option[Int] = None)
      : (DataFrame, Long) => Unit = { (batch, batchId) =>
    val s = batch.sparkSession
    // One lease spans the whole batch — recovery, replay check, append, and
    // auto-compaction — so a manual maintenance op cannot interleave with a
    // half-finished micro-batch (the inner calls re-enter this lease).
    // Acquisition RETRIES with bounded backoff instead of failing fast: the
    // stream-identity contract above explicitly supports multiple checkpoint
    // lineages feeding one index, and their micro-batches may overlap — a
    // fail-fast would terminate the losing lineage's whole streaming query,
    // when all it needs is serialization. A lease still held past
    // spark.graft.index.sinkLeaseWaitMs (default 10 min) rethrows: by then
    // the holder is either dead (its TTL reclaim will fire) or wedged, and
    // the stream SHOULD surface the failure.
    withWriterLeaseRetry(s, path, "appendSink") {
      // Self-recovery BEFORE anything reads the codes path: a crashed
      // reindex promote must be settled FIRST — otherwise this batch would
      // append into the superseded generation and silently vanish when the
      // pending promote later commits — then compaction debris (legacy
      // half-swap states and uncommitted staged generations). Both are
      // cheap no-ops (a few fs.exists) on a healthy index, so every sink
      // entry pays them, not just auto-compacting ones (a manual
      // compactCells/reindex crash must not strand a plain sink either).
      recoverReindex(s, path)
      recoverCompaction(s, path)
      if (!batchApplied(s, path, batchId, streamId)) {
        val admitted = batchCap match {
          case Some(cap) =>
            val n = batch.count()
            if (n > cap) {
              capDrops.foreach(_.add(n - cap))
              // deterministic admission: smallest ids first, so a replayed
              // capped batch admits the same rows
              batch.orderBy(id).limit(cap)
            } else batch
          case None => batch
        }
        appendCodes(s, path, admitted, id, emb, pq, stamp = Some(batchId), streamId)
        autoCompactFilesPerCell.foreach { threshold =>
          require(threshold >= 1, "autoCompactFilesPerCell must be >= 1")
          if (maxFilesPerCell(s, path) > threshold) compactCells(s, path)
        }
      }
    }
  }

  /** Largest parquet-file count in any one cell partition — the
    * fragmentation signal [[appendSink]]'s auto-compaction triggers on.
    * One listing pass over the codes tree.
    */
  def maxFilesPerCell(s: SparkSession, path: String): Int = {
    val fs = hadoopFs(s, path)
    val codes = new org.apache.hadoop.fs.Path(snapshot(s, path).partPath("codes"))
    if (!fs.exists(codes)) 0
    else fs.listStatus(codes).iterator
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("cell="))
      .map(st => fs.listStatus(st.getPath).count(_.getPath.getName.endsWith(".parquet")))
      .maxOption.getOrElse(0)
  }

  /** Has `batchId` (or any later batch) already been applied to the index?
    * Two layers, each correct where the other is not:
    *
    *   1. the HIGH-WATER MARKER (`applied_batch`, written only AFTER a
    *      batch's codes append completes) — O(1) to read, and because it
    *      trails the data it can never claim an unapplied batch. It also
    *      survives [[upsertBatch]]: maintenance may rewrite or delete the
    *      very rows carrying the max `__batch` stamp (updated rows get
    *      null there), which would regress a purely data-derived max and
    *      re-apply a replayed batch — the marker cannot regress;
    *   2. the data-derived max(__batch) — the fallback for the crash
    *      window where the append landed but the marker write was lost,
    *      and for indexes created before the marker existed.
    *
    * Both layers are SCOPED by `streamId` when one is supplied: the marker
    * file is per-stream and the data max considers only rows whose
    * `__stream` stamp matches, so a lineage restarted under a new id never
    * sees another lineage's progress (see [[appendSink]]'s stream-identity
    * contract).
    */
  /** Observable count of the adopted-index edge warnings below — a test
    * seam so the warning's firing is assertable, not just printed.
    */
  private[graft] val adoptedIndexWarnings = new java.util.concurrent.atomic.AtomicLong

  private def batchApplied(s: SparkSession, path: String, batchId: Long,
      streamId: Option[String]): Boolean =
    readAppliedBatch(s, path, streamId).exists(_ >= batchId) || {
      val codes = loadCodesFull(s, path)
      val scoped = streamId match {
        case Some(sid) =>
          if (codes.columns.contains("__stream")) codes.filter(col("__stream") === sid)
          else {
            // ADOPTED-INDEX EDGE, made loud: a streamId was supplied but no
            // row carries a __stream stamp — a pre-stream-identity index
            // adopted under a new id. Correct-conservative for a fresh
            // lineage (nothing to compare against), but if this index WAS
            // fed by an unstamped lineage whose marker write was lost in
            // the crash window, the fallback is dark and a replayed batch
            // re-applies. The contract ("stable streamId per lineage")
            // covers it; the warning makes the edge observable.
            adoptedIndexWarnings.incrementAndGet()
            logWarning(s"batchApplied: streamId '$sid' supplied but index at " +
              s"$path carries no __stream stamps (index adopted under a new " +
              "stream identity?) — data-derived replay fallback is inactive " +
              "for this lineage; only the high-water marker protects against " +
              "replays")
            codes.limit(0)
          }
        case None => codes
      }
      codes.columns.contains("__batch") && {
        val m = scoped.agg(max(col("__batch"))).head()
        !m.isNullAt(0) && m.getLong(0) >= batchId
      }
    }

  private def hadoopFs(s: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), s.sparkContext.hadoopConfiguration)

  // ---- generation manifest (reader-atomic swaps) ---------------------------

  /** One resolved generation of the index: the manifest's part→directory
    * mapping, read ONCE — every part path derived from one snapshot belongs
    * to the same committed generation, so a reader that resolves a snapshot
    * and then loads quantizer + codes through it can never observe a
    * mixed-generation index, no matter what swaps commit meanwhile (the
    * previous generation's directories are retained until the NEXT commit,
    * so an in-flight reader's files outlive one concurrent swap; only a
    * reader spanning TWO swaps fails, loudly, on the missing files).
    */
  final case class IndexSnapshot(path: String, gen: Long,
      dirs: Map[String, String]) {
    def partPath(part: String): String = s"$path/${dirs(part)}"
  }

  private val ManifestRe = "manifest-(\\d{9})".r
  private def manifestFile(path: String, gen: Long) =
    new org.apache.hadoop.fs.Path(f"$path/manifest-$gen%09d")
  private def flatDirs: Map[String, String] = indexParts.map(p => p -> p).toMap

  /** Generation numbers of all committed manifests at the index root
    * (empty for a legacy flat index that has never swapped).
    */
  private def manifestGens(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[Long] =
    // ONLY a missing root means "fresh/legacy index" (no manifests yet).
    // Any other IO failure must propagate: swallowing it would silently
    // resolve a generation-managed index as the flat gen-0 layout — a
    // reader would serve the superseded generation and a writer would
    // append into a directory the next GC deletes.
    try fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
      .map(_.getPath.getName)
      .collect { case ManifestRe(g) => g.toLong }
      .sorted
    catch { case _: java.io.FileNotFoundException => Seq.empty }

  /** Resolve the CURRENT committed generation — one atomic read of the
    * newest manifest (or the implicit generation 0: the legacy flat layout,
    * which every index starts from until its first swap). This is the
    * reader entry point: resolve once, then load every part through the
    * snapshot.
    */
  def snapshot(s: SparkSession, path: String): IndexSnapshot = {
    val fs = hadoopFs(s, path)
    manifestGens(fs, path).lastOption match {
      case None => IndexSnapshot(path, 0L, flatDirs)
      case Some(gen) =>
        val dirs = readManifest(fs, manifestFile(path, gen))
        IndexSnapshot(path, gen, flatDirs ++ dirs)
    }
  }

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Map[String, String] = {
    val in = fs.open(p)
    val content = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toString("UTF-8")
    } finally in.close()
    content.linesIterator.flatMap { line =>
      line.split("=", 2) match {
        case Array(k, v) if indexParts.contains(k) => Some(k -> v)
        case _ => None
      }
    }.toMap
  }

  /** The directory a swap of `part` must stage its replacement into — the
    * next generation's name, deterministic from the current snapshot so a
    * crashed-and-retried swap restages the same target.
    */
  private def stagedDirName(snap: IndexSnapshot, part: String): String =
    s"${part}_gen_${snap.gen + 1}"

  /** COMMIT a swap: write the next manifest (carrying the current mapping
    * overlaid with `newDirs`) via tmp-file + rename-to-fresh-name — atomic
    * on HDFS and local fs, and readers always resolve the newest complete
    * manifest, so the flip is all-or-nothing for every part at once. Then
    * garbage-collect: directories referenced by neither the new nor the
    * previous generation are deleted, as are manifests older than the
    * previous (so at most two generations of any part ever sit on disk —
    * the MVCC retention that keeps one swap's worth of in-flight readers
    * alive). Caller must hold the writer lease.
    */
  private def commitParts(s: SparkSession, path: String,
      newDirs: Map[String, String]): Unit = {
    val fs = hadoopFs(s, path)
    val snap = snapshot(s, path)
    val next = snap.dirs ++ newDirs
    val gen = snap.gen + 1
    val tmp = new org.apache.hadoop.fs.Path(
      s"$path/.manifest-tmp-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(indexParts.map(p => s"$p=${next(p)}").mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    finally out.close()
    val dst = manifestFile(path, gen)
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"manifest commit for generation $gen at $path lost a race — " +
          "a concurrent writer committed despite the lease")
    }
    gcGenerations(s, path, gen, next)
  }

  /** Drop everything no generation ≥ (committedGen − 1) references: old
    * manifests and orphaned part directories. The previous generation's
    * refs are kept whole for in-flight readers (see [[commitParts]]).
    *
    * `committedDirs` is the just-committed mapping, passed IN-MEMORY from
    * [[commitParts]]: the live generation's refs must never be re-read from
    * disk here, where a transient IOException would degrade them to a guess
    * and the guess would delete the live data. The previous generation's
    * manifest IS read back — and an unreadable read ABORTS the GC (it is
    * best-effort; debris is re-collected on the next commit) rather than
    * falling back to a ref set that can't be proven.
    */
  private def gcGenerations(s: SparkSession, path: String,
      committedGen: Long, committedDirs: Map[String, String]): Unit = {
    val fs = hadoopFs(s, path)
    val prevRefs: Option[Set[String]] =
      if (committedGen - 1 <= 0) Some(flatDirs.values.toSet)
      else try Some(
        (flatDirs ++ readManifest(fs, manifestFile(path, committedGen - 1)))
          .values.toSet)
      catch { case e: java.io.IOException =>
        logError(s"skipping generation GC at $path: previous manifest " +
          s"(gen ${committedGen - 1}) unreadable — ${e.getMessage}")
        None
      }
    prevRefs.foreach { prev =>
      val keep = committedDirs.values.toSet ++ prev
      val partDirRe = s"(${indexParts.mkString("|")})(_gen_\\d+)?".r
      try fs.listStatus(new org.apache.hadoop.fs.Path(path)).foreach { st =>
        val n = st.getPath.getName
        n match {
          case ManifestRe(g) if g.toLong < committedGen - 1 =>
            fs.delete(st.getPath, false); ()
          case partDirRe(_, _) if st.isDirectory && !keep.contains(n) =>
            fs.delete(st.getPath, true); ()
          case _ => ()
        }
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Delete STAGED-BUT-UNCOMMITTED generation directories (a swap that
    * crashed before its manifest commit): any `part_gen_g` with g beyond
    * the committed generation is debris — EXCEPT the target generation of a
    * pending committed reindex (`reindex_staging/_COMMITTED` names it),
    * whose promoted parts must survive until [[recoverReindex]] rolls the
    * swap forward. Caller must hold the writer lease.
    */
  private def dropUncommittedStaging(s: SparkSession, path: String): Unit = {
    val fs = hadoopFs(s, path)
    val committed = snapshot(s, path).gen
    val pendingReindexGen = pendingReindexTarget(s, path)
    val partDirRe = s"(${indexParts.mkString("|")})_gen_(\\d+)".r
    try fs.listStatus(new org.apache.hadoop.fs.Path(path)).foreach { st =>
      st.getPath.getName match {
        case partDirRe(_, g)
            if st.isDirectory && g.toLong > committed &&
              !pendingReindexGen.contains(g.toLong) =>
          fs.delete(st.getPath, true); ()
        case _ => ()
      }
    } catch { case _: java.io.IOException => () }
  }

  /** Target generation of a committed-but-unpromoted reindex, read from the
    * `_COMMITTED` marker; None when no reindex is pending or the marker is
    * the legacy (empty) form.
    */
  private def pendingReindexTarget(s: SparkSession, path: String): Option[Long] = {
    val fs = hadoopFs(s, path)
    val marker = new org.apache.hadoop.fs.Path(s"$path/reindex_staging/_COMMITTED")
    if (!fs.exists(marker)) None
    else readLease(fs, marker).flatMap(_.trim.toLongOption)
  }

  // ---- single-writer lease -------------------------------------------------

  /** A second concurrent maintenance writer was detected and refused. Every
    * mutation here (append/upsert/compact/split/reindex and their
    * recoveries) documents single-writer semantics; this makes a violation
    * fail fast instead of silently corrupting the index.
    */
  final case class ConcurrentIndexWriterException(path: String, op: String,
      holder: String) extends RuntimeException(
    s"index at $path is held by another maintenance writer [$holder] — " +
      s"refusing $op; maintenance is single-writer (a crashed holder's " +
      "lease expires after spark.graft.index.leaseTtlMs, default 10 min)")

  /** Per-thread re-entrancy count per index path: a maintenance op that
    * calls another (splitCell → upsertCore's caller, appendSink →
    * recoverCompaction/compactCells, reindex → recoverReindex) re-enters
    * the lease it already holds instead of deadlocking on itself.
    */
  private val leaseDepths =
    new ThreadLocal[scala.collection.mutable.Map[String, Int]] {
      override def initialValue() = scala.collection.mutable.Map.empty[String, Int]
    }

  private def leaseFile(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/maintenance_lease")

  /** Thrown on exit from a maintenance op whose lease was observed held by
    * ANOTHER writer mid-op (the TTL reclaim fired against a live-but-slow
    * holder — e.g. a long encode inside [[reindex]] starved the heartbeat
    * past the TTL). The op's mutations may have interleaved with the
    * reclaimer's; the index should be verified ([[refreshOccupancy]], the
    * recovery entry points) before further maintenance. The heartbeat
    * (period ttl/3) makes this practically unreachable for healthy JVMs —
    * it exists so the failure is LOUD, never silent.
    */
  final case class LostIndexLeaseException(path: String, op: String,
      holder: String, observed: String) extends RuntimeException(
    s"maintenance lease on $path was lost mid-$op: this writer is [$holder] " +
      s"but the lease now reads [$observed] — the TTL reclaim fired against " +
      "a live holder; mutations may have interleaved, verify the index " +
      "before further maintenance")

  /** Run `body` holding the index's exclusive maintenance lease — a lease
    * file created with create-exclusive semantics (atomic on HDFS and on
    * the local fs), carrying holder id + op + wall time. A second writer
    * fails fast with [[ConcurrentIndexWriterException]]; a lease whose file
    * age exceeds `spark.graft.index.leaseTtlMs` (default 10 min) belongs to
    * a crashed holder and is reclaimed (via an atomic rename-to-tombstone,
    * so two reclaimers can never both win, and a fresh lease that slipped
    * in under the staleness check is put back untouched).
    *
    * While `body` runs, a daemon HEARTBEAT thread re-stamps the lease every
    * ttl/3, so a live holder's lease never goes stale no matter how long
    * the op runs — the TTL only ever reclaims genuinely dead holders. On
    * release, the lease is deleted ONLY if this writer still owns it; a
    * foreign lease (the reclaim fired anyway — e.g. the whole JVM was
    * paused past the TTL) is left in place for its rightful holder and the
    * op exits loudly with [[LostIndexLeaseException]].
    *
    * Readers (loadCodes/searchAdc*) are NOT serialized by the lease; their
    * consistency across swaps is the generation manifest's job.
    */
  private[graft] def withWriterLease[A](s: SparkSession, path: String,
      op: String)(body: => A): A = {
    val depths = leaseDepths.get()
    if (depths.getOrElse(path, 0) > 0) {
      depths(path) += 1
      try body finally { depths(path) -= 1; () }
    } else {
      val ttlMs = leaseTtlMs(s)
      val holder = acquireLease(s, path, op, ttlMs)
      val fs = hadoopFs(s, path)
      val p = leaseFile(path)
      val ownerTag = s"$holder $op"
      val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
      val stop = new java.util.concurrent.CountDownLatch(1)
      val beat = new Thread(() => {
        val period = math.max(ttlMs / 3, 100L)
        var live = true
        while (live && !stop.await(period, java.util.concurrent.TimeUnit.MILLISECONDS)) {
          restampLease(fs, p, ownerTag) match {
            case RestampResult.Stamped | RestampResult.Transient => ()
            case RestampResult.Lost => lost.set(true); live = false // reclaimed under us — go loud
          }
        }
      }, s"graft-lease-heartbeat-$op")
      beat.setDaemon(true)
      beat.start()
      depths(path) = 1
      // The heartbeat must be CONFIRMED DEAD before the release delete: a
      // beat caught between its ownership read and its re-stamp create
      // would resurrect the lease right after the delete — a zombie no
      // heartbeat maintains, blocking every writer until the TTL reclaim.
      // Idempotent; waits in 500 ms joins up to the cap.
      def beatStopped(maxWaitMs: Long): Boolean = {
        stop.countDown()
        val deadline = System.currentTimeMillis() + maxWaitMs
        while (beat.isAlive && System.currentTimeMillis() < deadline) beat.join(500)
        !beat.isAlive
      }
      // ownership-checked release: delete ONLY a lease this writer still
      // owns — deleting blindly would evict a reclaimer that took over
      // mid-op and silently admit a third writer. Idempotent (success path
      // releases eagerly so it can THROW on a foreign lease; the finally
      // re-runs it non-throwing for the exception path).
      var releaseDone = false
      def release(throwOnForeign: Boolean): Unit = if (!releaseDone) {
        releaseDone = true
        if (!beatStopped(60000L)) {
          // wedged in a slow fs call — deleting now could race its
          // re-stamp; leave the lease for the TTL reclaim (loud, bounded)
          logError(s"lease heartbeat for $op on $path did not stop in 60s " +
            "— leaving the lease in place for the TTL reclaim")
        } else readLease(fs, p) match {
          case Some(content) if content.startsWith(ownerTag) =>
            try { fs.delete(p, false); () } catch { case _: java.io.IOException => () }
          case Some(content) =>
            val msg = s"maintenance lease on $path held by [$content] at " +
              s"release of $op by [$holder] — leaving it in place; the TTL " +
              "reclaim fired against this live holder"
            if (throwOnForeign) throw LostIndexLeaseException(path, op, holder, content)
            else logError(msg)
          case None => () // already gone (reclaim in flight) — nothing to release
        }
      }
      try {
        val r = body
        beatStopped(60000L)
        if (lost.get()) // heartbeat saw the reclaim first — abort loudly
          throw LostIndexLeaseException(path, op, holder,
            readLease(fs, p).getOrElse("<missing>"))
        release(throwOnForeign = true)
        r
      } finally {
        depths.remove(path)
        try release(throwOnForeign = false)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** [[withWriterLease]] with bounded-backoff retry on contention — the
    * streaming-sink acquisition mode (see [[appendSink]]): micro-batches
    * from concurrent lineages serialize instead of killing each other's
    * query. Backoff doubles 250 ms → 5 s; gives up (rethrowing the
    * contention) after `spark.graft.index.sinkLeaseWaitMs` (default 10 min,
    * = the default lease TTL, so a dead holder is always outlasted).
    */
  private[graft] def withWriterLeaseRetry[A](s: SparkSession, path: String,
      op: String)(body: => A): A = {
    val maxWaitMs = scala.util.Try(
      s.conf.get("spark.graft.index.sinkLeaseWaitMs", "600000").toLong)
      .getOrElse(600000L)
    val deadline = System.currentTimeMillis() + maxWaitMs
    var backoff = 250L
    while (true) {
      try return withWriterLease(s, path, op)(body)
      catch {
        case e: ConcurrentIndexWriterException =>
          if (System.currentTimeMillis() + backoff > deadline) throw e
          Thread.sleep(backoff)
          backoff = math.min(backoff * 2, 5000L)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def leaseTtlMs(s: SparkSession): Long = scala.util.Try(
    s.conf.get("spark.graft.index.leaseTtlMs", "600000").toLong)
    .getOrElse(600000L)

  private def readLease(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](256)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim)
      } finally in.close()
    } catch { case _: java.io.IOException => None }

  /** @return the holder id stamped into the acquired lease */
  private def acquireLease(s: SparkSession, path: String, op: String,
      ttlMs: Long): String = {
    val fs = hadoopFs(s, path)
    val p = leaseFile(path)
    val holder = java.lang.management.ManagementFactory.getRuntimeMXBean.getName +
      "/t" + Thread.currentThread().getId
    def tryCreate(): Boolean =
      try {
        // overwrite=false IS the lock: exactly one concurrent creator wins
        val out = fs.create(p, false)
        try out.write(s"$holder $op ${System.currentTimeMillis()}\n".getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (!tryCreate()) {
      val stale =
        try System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime > ttlMs
        catch { case _: java.io.FileNotFoundException => true } // holder just released
      val reclaimed = stale && tryReclaim(fs, p, ttlMs) && {
        // another reclaimer may win the re-create — that's fine (exactly one
        // writer emerges either way)
        tryCreate()
      }
      if (!reclaimed) {
        throw ConcurrentIndexWriterException(path, op,
          readLease(fs, p).getOrElse("unreadable lease"))
      }
    }
    holder
  }

  private[graft] sealed trait RestampResult
  private[graft] object RestampResult {
    case object Stamped extends RestampResult   // re-stamped; still the owner
    case object Transient extends RestampResult // fs hiccup / in-flight cycle; retry next beat
    case object Lost extends RestampResult      // lease is someone else's — go loud
  }

  /** Re-stamp the heartbeat's lease WITHOUT writing content — the r14
    * residual race closed. The old read-then-`create(overwrite=true)`
    * re-stamp could CLOBBER a reclaimer that completed its full tombstone
    * cycle (rename → verify-stale → delete → create) inside the read/write
    * window, replacing the reclaimer's lease with the old holder's and
    * leaving TWO JVMs each believing they own the index — persistently,
    * because every later beat re-affirmed the clobbered state.
    *
    * The staleness check ([[acquireLease]]/[[tryReclaim]]) reads only the
    * lease file's MTIME, so the re-stamp needs no content write at all:
    * `setTimes` bumps the mtime in place. The read→touch window still
    * exists, but its worst case is now harmless — touching a lease a
    * reclaimer just created keeps the reclaimer's lease FRESH (content
    * untouched; it survives as the one true lease) and the very next beat
    * reads the foreign tag and goes loud (Lost → the op aborts with
    * [[LostIndexLeaseException]]). No interleaving can vacate the lease
    * path (contenders always fail fast against a present lease) and none
    * can end with two surviving leases. Every arm is driven directly by
    * VectorIndexLifecycleSpec.
    */
  private[graft] def restampLease(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, ownerTag: String): RestampResult =
    readLease(fs, p) match {
      case Some(c) if c.startsWith(ownerTag) =>
        try { fs.setTimes(p, System.currentTimeMillis(), -1); RestampResult.Stamped }
        // incl. FileNotFound: an in-flight reclaim cycle holds the file
        // right now; the next beat sees its outcome (restored ours → stamp;
        // foreign → Lost)
        catch { case _: java.io.IOException => RestampResult.Transient }
      case Some(_) => RestampResult.Lost // reclaimed under us — go loud
      case None => RestampResult.Transient // released/mid-cycle; next beat resolves
    }

  /** Atomic stale-lease steal, closing the check-then-act race: RENAME the
    * lease to a unique tombstone (exactly one contender's rename succeeds —
    * the source vanishes for everyone else), then RE-VERIFY staleness on
    * the tombstone (rename preserves mtime): if a fresh lease slipped in
    * between the caller's staleness read and our rename, it is put straight
    * back and the steal is abandoned. Returns true when the path is clear
    * for a create attempt.
    */
  private def tryReclaim(fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path, ttlMs: Long): Boolean = {
    val tomb = new org.apache.hadoop.fs.Path(p.getParent,
      p.getName + ".reclaim." + System.nanoTime() + "." + Thread.currentThread().getId)
    val renamed = try fs.rename(p, tomb)
      catch { case _: java.io.IOException => false }
    if (!renamed) {
      // source vanished: the holder released or another reclaimer won the
      // rename — either way the path may now be free; let create decide
      try !fs.exists(p) catch { case _: java.io.IOException => false }
    } else {
      val stillStale = try
        System.currentTimeMillis() - fs.getFileStatus(tomb).getModificationTime > ttlMs
        catch { case _: java.io.IOException => false }
      if (stillStale) {
        try { fs.delete(tomb, false); () } catch { case _: java.io.IOException => () }
        true
      } else {
        // we stole a FRESH lease (holder re-stamped between check and
        // rename) — restore it; if its owner already re-created one, drop
        // the duplicate tombstone instead
        try { if (!fs.rename(tomb, p)) fs.delete(tomb, false); () }
        catch { case _: java.io.IOException =>
          try { fs.delete(tomb, false); () } catch { case _: java.io.IOException => () }
        }
        false
      }
    }
  }

  /** Per-stream marker file name; the unscoped legacy name when no stream
    * identity is in play. Stream ids are sanitized to a filename-safe
    * charset so a caller-supplied id can never escape the index directory.
    */
  private def markerName(streamId: Option[String]): String =
    streamId.fold("applied_batch")(sid =>
      "applied_batch_" + sid.replaceAll("[^A-Za-z0-9._-]", "_"))

  private def readAppliedBatch(s: SparkSession, path: String,
      streamId: Option[String]): Option[Long] = {
    val fs = hadoopFs(s, path)
    val p = new org.apache.hadoop.fs.Path(s"$path/${markerName(streamId)}")
    if (!fs.exists(p)) None
    else scala.util.Try {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](64)
        val n = in.read(buf)
        new String(buf, 0, math.max(n, 0), "UTF-8").trim.toLong
      } finally in.close()
      // a torn write parses as garbage → None → the data-derived fallback
    }.toOption
  }

  /** Advance the high-water mark — monotonic, called only after the
    * batch's codes are durably appended.
    */
  private def writeAppliedBatch(s: SparkSession, path: String, batchId: Long,
      streamId: Option[String]): Unit =
    if (!readAppliedBatch(s, path, streamId).exists(_ >= batchId)) {
      val fs = hadoopFs(s, path)
      val out = fs.create(
        new org.apache.hadoop.fs.Path(s"$path/${markerName(streamId)}"), true)
      try out.write(s"$batchId\n".getBytes("UTF-8")) finally out.close()
    }

  /** Full recount of the occupancy table from the codes — the recovery
    * path for the (documented) crash window in [[appendSink]], and a
    * general consistency restore.
    */
  def refreshOccupancy(s: SparkSession, path: String): Unit =
    withWriterLease(s, path, "refreshOccupancy") {
      // settle a crashed-but-committed reindex first — recounting the
      // superseded generation's codes would persist an occupancy the
      // promote immediately invalidates
      recoverReindex(s, path)
      val snap = snapshot(s, path)
      cellOccupancy(loadCodes(s, snap)).localCheckpoint()
        .write.mode("overwrite").parquet(snap.partPath("occupancy"))
    }

  // ---- small-file compaction --------------------------------------------

  /** Compact the codes layout back to ONE file per cell partition. Each
    * [[appendBatch]]/streaming epoch appends a small file to every touched
    * cell, so after N daily appends a pruned search opens N files per
    * probed cell — compaction is the hygiene pass that restores the
    * 1-file-per-cell layout ([[Compaction]] is the generic dual; this one
    * knows the cell layout). `repartition(cell)` puts each cell's rows in
    * exactly one task, so the rewrite emits exactly one file per cell; the
    * result is staged COMPLETE in the next generation's directory and
    * committed with one atomic manifest flip ([[commitParts]]) — no
    * driver/executor materialization of the corpus, no read-overwrite
    * conflict, and READERS ARE SAFE THROUGHOUT: the live generation's
    * files are untouched until the commit, and retained through one more
    * commit after it for in-flight readers. All columns survive, including
    * streaming `__batch` stamps — max(__batch) replay detection still
    * works post-compaction.
    *
    * CRASH RECOVERY: a crash before the manifest commit leaves the staged
    * generation as unreferenced debris and the live index UNTOUCHED —
    * [[recoverCompaction]] (run on every entry here and on every
    * [[appendSink]] entry) just deletes the debris; re-running the
    * compaction redoes the work. There is no crash window in which the
    * index stops serving — the improvement over the old rename-swap, whose
    * mid-swap states this recovery still repairs when found on a
    * pre-manifest index.
    */
  def compactCells(s: SparkSession, path: String): Unit =
      withWriterLease(s, path, "compactCells") {
    recoverReindex(s, path) // settle a pending reindex promote first (gen order)
    recoverCompaction(s, path)
    val snap = snapshot(s, path)
    val stagedDir = stagedDirName(snap, "codes")
    val full = codesFullSchemaRead(s, snap.partPath("codes"))
    full.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/$stagedDir")
    // staged dir is fresh and complete: its marker is the rewrite's schema
    // (rides the manifest flip with the data it describes)
    writeSchemaMarker(s, s"$path/$stagedDir", full.schema)
    commitParts(s, path, Map("codes" -> stagedDir))
    // fold the sidecar's append-only stale entries while we're at the
    // hygiene pass anyway — compaction changes no id→cell mapping, so the
    // pre-fold sidecar stays a valid superset through every crash window.
    // A compacted index now under the read threshold drops it instead
    // (absence-safe; the size lifecycle restores it at the next crossing).
    if (hadoopFs(s, path).exists(idMapPath(path))) {
      val codesDir = snapshot(s, path).partPath("codes")
      if (codesBytes(s, codesDir) >= sidecarReadMinBytes)
        rebuildIdMapFrom(s, path, codesDir)
      else { hadoopFs(s, path).delete(idMapPath(path), true); () }
    }
  }

  /** Repair an interrupted [[compactCells]] — idempotent, no-op on a
    * healthy index. Under the generation manifest the only crash state is
    * staged-but-uncommitted debris ([[dropUncommittedStaging]]); the
    * legacy pre-manifest rename-swap states (`codes/` missing with
    * `codes_old/` + `codes_compacting/` present) are still repaired when
    * found on an index that has never committed a manifest:
    *
    *   - legacy `codes/` missing: roll FORWARD if the stage carries
    *     `_SUCCESS`, else roll BACK to `codes_old/`;
    *   - legacy `codes/` present: stage/old directories are debris.
    */
  def recoverCompaction(s: SparkSession, path: String): Unit =
      withWriterLease(s, path, "recoverCompaction") {
    val fs = hadoopFs(s, path)
    dropUncommittedStaging(s, path)
    if (manifestGens(fs, path).isEmpty) {
      def p(n: String) = new org.apache.hadoop.fs.Path(s"$path/$n")
      val (codes, old, staged) = (p("codes"), p("codes_old"), p("codes_compacting"))
      if (!fs.exists(codes)) {
        if (fs.exists(new org.apache.hadoop.fs.Path(staged, "_SUCCESS"))) {
          fs.rename(staged, codes)
          fs.delete(old, true)
        } else if (fs.exists(old)) {
          fs.delete(staged, true)
          fs.rename(old, codes)
        }
      } else {
        fs.delete(staged, true)
        fs.delete(old, true)
      }
    }
    ()
  }

  // ---- hot-cell split ------------------------------------------------------

  /** Split one (hot) cell of a persisted index into two children: sub-train
    * k'=2 centroids on the cell's member vectors (deterministic [[KMeans]]
    * seeding), REPLACE the parent centroid with the children in the stored
    * centroid table, and re-encode only the members under the refined
    * quantizer — the PQ codebook stays frozen, the rest of the corpus is
    * untouched, and the whole rewrite rides [[upsertBatch]]'s machinery
    * (touched-cells-only dynamic overwrite, emptied-parent-dir cleanup,
    * occupancy maintenance), so the split inherits the upsert's pinned
    * incremental-≡-rebuild law: the post-split index answers EXACTLY like a
    * from-scratch encode of the corpus under the post-split centroid table
    * (spec-pinned). This is the response to the skew signal
    * `ann_index_occupancy` measures: a hot cell destroys the nprobe/k
    * pruning promise (one probe reads imbalance× the uniform share);
    * splitting it halves the hot probe and restores child-granular pruning.
    *
    * What a split deliberately does NOT promise: bit-identical answers to
    * the pre-split index. A refined quantizer assigns members to their
    * nearest centroid among k+1 (a member may even land in a third,
    * pre-existing cell if that was always closer than the parent), and a
    * query's nprobe-cell probe set changes with the geometry — any
    * "identical answers" scheme would have to probe both children whenever
    * the parent would have been probed, i.e. read exactly the bytes the
    * split exists to avoid. The honest contract is the rebuild-equivalence
    * law above plus the recall gate (`ann_recall_at_5`) the index is
    * already held to.
    *
    * The index stores codes, not vectors, so the caller supplies the
    * vector source for the members (same contract as [[upsertBatch]]'s
    * `updates`); rows whose `id` is not a member are ignored.
    *
    * CRASH RECOVERY (staged manifest, the [[compactCells]] discipline):
    * the chosen children centroids are persisted to `split_staging/`
    * BEFORE any mutation, and every entry here first rolls a previous
    * interrupted split forward ([[recoverSplit]]). The apply phase is
    * idempotent given the staged centroids — members are re-derived from
    * whatever currently sits in parent ∪ children cells, the upsert
    * converges from any intermediate state (its documented contract), and
    * the final centroid-table overwrite plus manifest delete commit the
    * split. Single-writer maintenance op, like compaction.
    *
    * @return the two child cell ids
    */
  def splitCell(s: SparkSession, path: String, cell: Long, vectors: DataFrame,
      id: Column, emb: Column, pq: PqParams, meta: Seq[String] = Nil): Seq[Long] =
      withWriterLease(s, path, "splitCell") {
    recoverReindex(s, path) // settle a pending reindex promote first (gen order)
    recoverSplit(s, path, vectors, id, emb, pq, meta)
    // one hot cell's ids, materialized once (r18): the 4 sub-train actions
    // (seed TakeOrdered + 3 Lloyd iterations) would otherwise each
    // re-execute this build side — a codes scan + distinct per action
    val memberIds = loadCodes(s, path).filter(col("cell") === cell)
      .select(col("vec_id").as("__split_member")).distinct()
      .localCheckpoint()
    // the member VECTORS too (r18): the sub-train's 4 actions (seed
    // TakeOrdered + 3 Lloyd iterations) each re-execute their input — with
    // only the id set materialized that is still a full `vectors` scan per
    // action (the broadcast semi-join prunes rows, not the scan). One hot
    // cell's vectors are bounded by construction (the split exists to bound
    // them), so the checkpoint holds O(cell) rows and saves 3 corpus reads.
    val members = vectors.join(broadcast(memberIds),
      id === col("__split_member"), "left_semi")
      .localCheckpoint()
    Dedup.dropLocalCheckpoint(memberIds) // folded into the members snapshot
    val sub = KMeans.fit(members, id, emb, k = 2, iters = 3)
      .orderBy(col("cent_id")).collect()
    Dedup.dropLocalCheckpoint(members) // consumed by the sub-train above
    // fewer than 2 sub-centroids = fewer than 2 member rows to seed from —
    // refinement cannot help this cell. Thrown BEFORE any staging or
    // mutation (the manifest write is below), so the index is untouched;
    // splitHottestCell translates it into NeedsRetrain instead of
    // propagating, per its documented contract.
    if (sub.length < 2) throw UnsplittableCellException(cell, sub.length)
    // fresh child ids above every existing cent_id: KMeans labels by seed
    // ROW id, which could collide with an existing centroid's id
    val maxId = s.read.parquet(snapshot(s, path).partPath("cents"))
      .agg(max(col("cent_id"))).head().getLong(0)
    val manifest = sub.zipWithIndex.map { case (r, i) =>
      (cell, maxId + 1 + i, r.getAs[scala.collection.Seq[Double]]("cent").toSeq)
    }
    import s.implicits._
    manifest.toSeq.toDF("parent", "cent_id", "cent")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/split_staging")
    applySplit(s, path, vectors, id, emb, pq, meta)
  }

  /** Roll an interrupted [[splitCell]] forward (complete staged manifest →
    * re-apply, idempotent) or back (partial manifest without its commit
    * marker → discard; no mutation had started). No-op on a healthy index.
    */
  def recoverSplit(s: SparkSession, path: String, vectors: DataFrame,
      id: Column, emb: Column, pq: PqParams, meta: Seq[String] = Nil): Unit =
      withWriterLease(s, path, "recoverSplit") {
    val fs = hadoopFs(s, path)
    val staging = new org.apache.hadoop.fs.Path(s"$path/split_staging")
    if (fs.exists(staging)) {
      if (fs.exists(new org.apache.hadoop.fs.Path(staging, "_SUCCESS"))) {
        applySplit(s, path, vectors, id, emb, pq, meta)
        ()
      } else {
        fs.delete(staging, true) // the manifest write itself crashed
        ()
      }
    }
  }

  /** The idempotent apply phase of a split, driven ONLY by the staged
    * manifest: build the post-split centroid table, re-encode every vector
    * currently coded in parent ∪ children cells under it (covers the fresh
    * run AND every crash intermediate — a member duplicated across a
    * half-swapped rewrite re-enters through either copy and the overwrite
    * collapses it), persist the new centroid table, drop the manifest.
    */
  private def applySplit(s: SparkSession, path: String, vectors: DataFrame,
      id: Column, emb: Column, pq: PqParams, meta: Seq[String]): Seq[Long] = {
    val man = s.read.parquet(s"$path/split_staging").orderBy(col("cent_id")).collect()
    val parent = man.head.getAs[Long]("parent")
    val childIds = man.map(_.getAs[Long]("cent_id")).toSeq
    import s.implicits._
    val childCents = man.map(r =>
      (r.getAs[Long]("cent_id"), r.getAs[scala.collection.Seq[Double]]("cent").toSeq))
      .toSeq.toDF("cent_id", "cent")
    // k+1 rows, checkpointed before the staged write below. The filter
    // removes the CHILD ids too, not just the parent: a crash between the
    // cents commit and the manifest delete leaves the persisted table
    // already post-split, and a recovery re-run that filtered only the
    // (absent) parent would union the staged children a second time —
    // duplicated centroid rows consume probe slots and double-match the
    // residual join, corrupting ADC sums. Filtering the staged ids makes
    // this read a fixed point: fresh run and every crash intermediate both
    // converge to exactly k+1 rows.
    val snap = snapshot(s, path)
    val newCents = s.read.parquet(snap.partPath("cents"))
      .filter(!col("cent_id").isin((parent +: childIds): _*))
      .unionByName(childCents)
      .localCheckpoint()
    val quant = IvfadcQuantizer(newCents,
      s.read.parquet(snap.partPath("codebook")), pq)
    val cellSet = parent +: childIds
    // parent ∪ children member ids, materialized once (r18): upsertCore
    // executes its `updates` input in several actions (encode checkpoint,
    // touched-cell collect, rewrite checkpoint), each of which would
    // otherwise re-run this build side's codes scan + distinct
    val memberIds = loadCodes(s, path).filter(col("cell").isin(cellSet: _*))
      .select(col("vec_id").as("__split_member")).distinct()
      .localCheckpoint()
    // member VECTORS materialized once (r18, same reasoning as splitCell's
    // sub-train input): upsertCore executes its `updates` in several
    // actions (the encode checkpoint, the changed-id snapshot) and each
    // would re-scan the full `vectors` source for O(parent ∪ children)
    // surviving rows. Bounded by the touched cells, dropped when consumed.
    val updates = vectors.join(broadcast(memberIds),
      id === col("__split_member"), "left_semi")
      .localCheckpoint()
    Dedup.dropLocalCheckpoint(memberIds) // folded into the updates snapshot
    upsertCore(s, path, updates, updates.limit(0).select(id.as("vec_id")),
      id, emb, quant, meta)
    Dedup.dropLocalCheckpoint(updates) // consumed by the upsert above
    // the cents replace is a GENERATION COMMIT, not an in-place overwrite:
    // readers resolve either the whole pre-commit or whole post-commit
    // centroid table (the codes rewrite above is partition-wise in place —
    // the split's documented touched-cells-only cost bound — so the split's
    // own window is still writer-side-only; the atomic flip here closes the
    // mixed cents/codes hazard the old in-place overwrite had)
    val stagedDir = stagedDirName(snapshot(s, path), "cents")
    newCents.write.mode("overwrite").parquet(s"$path/$stagedDir")
    commitParts(s, path, Map("cents" -> stagedDir))
    hadoopFs(s, path).delete(new org.apache.hadoop.fs.Path(s"$path/split_staging"), true)
    childIds
  }

  /** Thrown by [[splitCell]] BEFORE any staging or mutation when the cell
    * cannot yield two sub-centroids (it holds fewer than two member rows):
    * the index is untouched at throw time. [[splitHottestCell]] — whose
    * contract is to report rather than throw — maps it to [[NeedsRetrain]].
    */
  final case class UnsplittableCellException(cell: Long, centroids: Int)
    extends RuntimeException(
      s"cell $cell yields $centroids sub-centroid(s) — nothing to split")

  /** Outcome of one [[splitHottestCell]] policy step. */
  sealed trait SplitOutcome
  /** No cell exceeds the probe-cost bound — nothing to do. */
  case object Balanced extends SplitOutcome
  /** The hottest cell was split; loop for the next one. */
  final case class Split(parent: Long, children: Seq[Long]) extends SplitOutcome
  /** Splitting cannot help this cell (its members are indistinguishable to
    * the quantizer — the sub-train put them all in one child): the
    * quantizer itself has drifted past what refinement can fix. Stop
    * looping and re-train: [[train]] + [[encode]] over the current corpus
    * is the drift recovery, the FAISS contract.
    */
  final case class NeedsRetrain(cell: Long, rows: Long) extends SplitOutcome

  /** The POLICY consuming the skew signal [[occupancyReport]] pins: when
    * the hottest cell holds more than `maxCellRows` vectors, split it and
    * report what happened; below the bound, do nothing. One step per call —
    * callers loop while it returns [[Split]].
    *
    * Why the loop target is an ABSOLUTE row bound and not the report's
    * `imbalance` ratio: the pruning promise is about rows read per probed
    * cell, and max/mean cannot drive a split loop — every split ADDS a
    * cell, shrinking the mean, so the ratio tightens itself and can rise
    * even as the hottest cell halves (measured: 3.75 → 4.08 across a
    * max-reducing split on the skew fixture). `imbalance` stays the
    * ALERTING signal (when it degrades, something needs doing);
    * `maxCellRows` — pick it as (corpus rows / cells) × the skew factor a
    * probe may tolerate — is the actionable target.
    *
    * A step that splits WITHOUT reducing the hot cell (every member landed
    * in one child — identical or quantizer-indistinguishable vectors)
    * returns [[NeedsRetrain]]: the ineffective-but-harmless split stays
    * applied (the index remains rebuild-equivalent), and further splitting
    * of that cell cannot converge.
    */
  def splitHottestCell(s: SparkSession, path: String, vectors: DataFrame,
      id: Column, emb: Column, pq: PqParams, maxCellRows: Long,
      meta: Seq[String] = Nil): SplitOutcome =
      withWriterLease(s, path, "splitHottestCell") {
    // cast: `cell` comes back as the partition-directory-inferred type
    // (int for small ids), not the written long
    val hottest = occupancy(s, path)
      .orderBy(col("n_vecs").desc, col("cell")).limit(1)
      .select(col("cell").cast("long"), col("n_vecs")).collect()
    if (hottest.isEmpty || hottest.head.getLong(1) <= maxCellRows) Balanced
    else {
      val (hot, hotRows) = (hottest.head.getLong(0), hottest.head.getLong(1))
      try {
        val children = splitCell(s, path, hot, vectors, id, emb, pq, meta)
        // null max = both children empty (every member re-assigned to a
        // pre-existing closer cell — the hot mass dispersed: progress)
        val childMaxRow = occupancy(s, path)
          .filter(col("cell").cast("long").isin(children: _*))
          .agg(max(col("n_vecs"))).head()
        val childMax = if (childMaxRow.isNullAt(0)) 0L else childMaxRow.getLong(0)
        if (childMax >= hotRows) NeedsRetrain(hot, hotRows) else Split(hot, children)
      } catch {
        // a cell too degenerate to even sub-train (fewer than 2 member
        // rows) is the strongest possible NeedsRetrain signal, not an
        // error — splitCell guarantees the index is untouched at throw
        case UnsplittableCellException(_, _) => NeedsRetrain(hot, hotRows)
      }
    }
  }

  // ---- full retrain / reindex ---------------------------------------------

  /** The four persisted parts of an index, in the order the reindex swap
    * promotes them.
    */
  private val indexParts = Seq("cents", "codebook", "codes", "occupancy")

  /** Retrain the quantizer on the CURRENT corpus and atomically swap in a
    * freshly-encoded index — the response to the [[NeedsRetrain]] signal
    * and to general quantizer drift (the FAISS contract the scaladoc at
    * the top of this object cites: the quantizer is trained once and
    * batches are `add()`ed under it; when the data distribution drifts
    * past what [[splitCell]] refinement can fix, periodic retrain+reindex
    * is the recovery). Under the hood this is exactly [[train]] +
    * [[encode]] over the current corpus, made SAFE for a live index:
    *
    *   - the index stores codes, not vectors, so the caller supplies the
    *     vector source ([[splitCell]]'s contract); rows whose id is not
    *     currently coded are ignored — reindex changes the quantizer, not
    *     the membership;
    *   - the new index (cents/codebook/codes/occupancy) is built COMPLETELY
    *     under `reindex_staging/` while the old index keeps serving;
    *     nothing live is touched until the staged build carries its
    *     `_COMMITTED` marker;
    *   - the swap is per-part metadata renames (live → `reindex_old/`,
    *     staged → live), rolled forward from any crash point by
    *     [[recoverReindex]] (the [[compactCells]]/[[splitCell]] staged-
    *     manifest discipline): _COMMITTED present → the staged index wins,
    *     absent → the old index was never touched and the stage is debris.
    *
    * Equivalence contract (the `ann_reindex` oracle gate pins it
    * cross-engine): the reindexed index answers exactly like a from-scratch
    * [[train]]+[[encode]]+[[write]] over the current corpus — because that
    * is literally what the staged build is.
    *
    * Replay bookkeeping: the `applied_batch*` high-water markers live at
    * the index root and SURVIVE the swap — a replayed streaming batch is
    * still refused after a reindex (its vectors are already inside the
    * re-encoded corpus; re-appending them would duplicate). The re-encoded
    * rows carry no `__batch`/`__stream` stamps, so the data-derived
    * fallback restarts dark for pre-reindex batches — the marker is the
    * authority, the same trade documented on [[appendSink]].
    *
    * Single-writer maintenance op (lease-enforced, like everything here).
    * Readers during the brief per-part swap window are unsafe, as with
    * compaction — serve from a settled index or accept the recovery call.
    *
    * @param vectors vector source; only ids currently in the index are used
    * @param meta    filterable metadata columns to carry onto the new code
    *                rows (see the metadata-aware [[encode]])
    */
  def reindex(s: SparkSession, path: String, vectors: DataFrame, id: Column,
      emb: Column, kCells: Int, iters: Int, pq: PqParams,
      meta: Seq[String] = Nil): Unit = withWriterLease(s, path, "reindex") {
    recoverReindex(s, path) // settle any interrupted predecessor first
    // Materialized ONCE (r18, measured with JobProfile): the train+encode
    // chain below runs ~6 actions (seed TakeOrdered, one per Lloyd
    // iteration, codebook seeds, the codes write), and each would otherwise
    // re-execute this broadcast build side — a full codes scan + distinct
    // per action, ~6 redundant passes over the index. The checkpoint is the
    // same id set the broadcast ships, so it adds no memory class the
    // semi-join didn't already require; dropped eagerly after the promote.
    val memberIds = loadCodes(s, path)
      .select(col("vec_id").as("__member")).distinct()
      .localCheckpoint()
    val corpus = vectors.join(broadcast(memberIds),
      id === col("__member"), "left_semi")
    val quant = train(corpus, id, emb, kCells, iters, pq)
    val codes = encode(corpus, id, emb, quant, meta)
    val staging = s"$path/reindex_staging"
    val fs = hadoopFs(s, path)
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    quant.cents.write.mode("overwrite").parquet(s"$staging/cents")
    quant.csubs.write.mode("overwrite").parquet(s"$staging/codebook")
    // same cell-clustered one-file-per-cell layout as [[write]]
    codes.repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$staging/codes")
    // fresh staged dir: marker = exactly what was written (renamed into the
    // promoted generation together with the data)
    writeSchemaMarker(s, s"$staging/codes", codes.schema)
    cellOccupancy(s.read.parquet(s"$staging/codes"))
      .write.mode("overwrite").parquet(s"$staging/occupancy")
    // the commit point: the marker names the target generation, making the
    // promote below (staged-part renames + one manifest flip) re-runnable
    // from any crash point with a stable target
    val targetGen = snapshot(s, path).gen + 1
    val out = fs.create(new org.apache.hadoop.fs.Path(s"$staging/_COMMITTED"), true)
    try out.write(s"$targetGen\n".getBytes("UTF-8")) finally out.close()
    promoteReindex(s, path, targetGen)
    Dedup.dropLocalCheckpoint(memberIds) // superseded generation's id set
  }

  /** The roll-forwardable promote phase: rename each still-staged part to
    * its target-generation directory (a part already renamed by a crashed
    * predecessor is skipped), then flip the manifest — ONE atomic commit
    * covering all four parts, so a reader can never observe new cents with
    * old codes — and drop the staging area. Idempotent: re-runs skip
    * completed renames, and the commit is skipped if the target generation
    * is already live.
    */
  private def promoteReindex(s: SparkSession, path: String,
      targetGen: Long): Unit = {
    val fs = hadoopFs(s, path)
    def staged(n: String) = new org.apache.hadoop.fs.Path(s"$path/reindex_staging/$n")
    def target(n: String) = new org.apache.hadoop.fs.Path(s"$path/${n}_gen_$targetGen")
    indexParts.foreach { n =>
      if (fs.exists(staged(n)) && !fs.exists(target(n))) fs.rename(staged(n), target(n))
    }
    // every part must now sit at its target dir (renamed by us or a crashed
    // predecessor) — a missing one means the staged build was damaged by
    // hand; refuse to commit a broken generation
    val missing = indexParts.filterNot(n => fs.exists(target(n)))
    require(missing.isEmpty,
      s"reindex promote at $path: staged parts missing for generation " +
        s"$targetGen: ${missing.mkString(", ")}")
    if (snapshot(s, path).gen < targetGen) {
      // the sidecar maps the SUPERSEDED generation's cells — it must die
      // BEFORE the flip (a post-flip crash leaving the stale mapping live
      // would mis-route later upserts' touched-cell discovery; absence
      // just falls back to the full scan)
      fs.delete(idMapPath(path), true)
      commitParts(s, path,
        indexParts.map(n => n -> s"${n}_gen_$targetGen").toMap)
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/reindex_staging"), true)
    // rebuild from the promoted generation's codes (idempotent across
    // recovery re-runs: present means a completed post-flip rebuild);
    // a generation under the read threshold goes sidecar-less, like write()
    if (!fs.exists(idMapPath(path))) {
      val codesDir = snapshot(s, path).partPath("codes")
      if (codesBytes(s, codesDir) >= sidecarReadMinBytes)
        rebuildIdMapFrom(s, path, codesDir)
    }
    ()
  }

  /** Repair an interrupted [[reindex]] — idempotent, cheap no-op on a
    * healthy index. Decision table:
    *
    *   - `reindex_staging/` present WITH a generation-stamped `_COMMITTED`:
    *     the staged build is complete and authoritative — roll the promote
    *     FORWARD ([[promoteReindex]] skips completed renames and an
    *     already-live commit).
    *   - present WITH a legacy (empty) `_COMMITTED`: a pre-manifest crash —
    *     roll forward via the legacy flat-rename swap.
    *   - present WITHOUT the marker: the staged build itself crashed; the
    *     live index was never touched — drop the stage.
    *   - absent but legacy `reindex_old/` present: pre-manifest cleanup
    *     crash; restore any missing flat part and drop the debris.
    */
  def recoverReindex(s: SparkSession, path: String): Unit =
      withWriterLease(s, path, "recoverReindex") {
    val fs = hadoopFs(s, path)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$path/$n")
    val staging = p("reindex_staging")
    if (fs.exists(staging)) {
      val marker = new org.apache.hadoop.fs.Path(staging, "_COMMITTED")
      if (fs.exists(marker)) {
        pendingReindexTarget(s, path) match {
          case Some(targetGen) => promoteReindex(s, path, targetGen)
          case None => completeReindexSwapLegacy(s, path)
        }
      } else {
        fs.delete(staging, true)
        restoreFromOld(fs, path)
      }
    } else if (fs.exists(p("reindex_old"))) {
      restoreFromOld(fs, path)
    }
  }

  /** The pre-manifest promote: move live flat parts aside and rename the
    * staged ones into the flat locations. Only reachable for a crash state
    * left by a pre-manifest build (empty `_COMMITTED` marker).
    */
  private def completeReindexSwapLegacy(s: SparkSession, path: String): Unit = {
    val fs = hadoopFs(s, path)
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$path/$n")
    def staged(n: String) = new org.apache.hadoop.fs.Path(s"$path/reindex_staging/$n")
    def old(n: String) = new org.apache.hadoop.fs.Path(s"$path/reindex_old/$n")
    fs.mkdirs(p("reindex_old"))
    // stale-generation sidecar: drop before the parts move (legacy path —
    // no rebuild; the next rebuildIdMap/write recreates it on demand)
    fs.delete(idMapPath(path), true)
    indexParts.foreach { n =>
      if (fs.exists(staged(n))) {
        if (fs.exists(p(n))) { fs.delete(old(n), true); fs.rename(p(n), old(n)) }
        fs.rename(staged(n), p(n))
      }
    }
    fs.delete(p("reindex_old"), true)
    fs.delete(p("reindex_staging"), true)
    ()
  }

  /** Put back any part whose live copy is missing but whose pre-swap copy
    * survives under `reindex_old/`, then drop the old area. Defensive —
    * unreachable from [[completeReindexSwap]]'s own crash windows (the
    * stage, deleted last, still exists in all of them), but it makes
    * recovery total over hand-damaged states too.
    */
  private def restoreFromOld(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Unit = {
    def p(n: String) = new org.apache.hadoop.fs.Path(s"$path/$n")
    def old(n: String) = new org.apache.hadoop.fs.Path(s"$path/reindex_old/$n")
    indexParts.foreach { n =>
      if (!fs.exists(p(n)) && fs.exists(old(n))) fs.rename(old(n), p(n))
    }
    fs.delete(p("reindex_old"), true)
    ()
  }

  // ---- occupancy accounting ----------------------------------------------

  /** Per-cell vector counts of a codes table — the no-silent-caps principle
    * applied to the coarse quantizer (the IVF dual of `dropped_pairs` in
    * [[Dedup]]): k-means on a skewed corpus concentrates vectors in few
    * cells, silently destroying [[searchAdcPruned]]'s nprobe/k pruning —
    * a probe of the hottest cell reads imbalance× the uniform share. One
    * row per (vector, subspace) ⇒ count rows of subspace 0.
    */
  def cellOccupancy(codes: DataFrame): DataFrame =
    codes.filter(col("m") === 0)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))

  /** The persisted per-cell occupancy of an index ([[write]] seeds it;
    * [[appendBatch]]/[[upsertBatch]] maintain it incrementally).
    */
  def occupancy(s: SparkSession, path: String): DataFrame =
    s.read.parquet(snapshot(s, path).partPath("occupancy"))

  /** Skew summary over the persisted occupancy: `imbalance` is the
    * worst-case pruned-scan degradation factor (max cell / mean cell) —
    * an `imbalance` of 1 means nprobe/k pruning delivers exactly its
    * promise; at 40 the hottest probe costs 40× the uniform share and the
    * quantizer needs retraining.
    */
  def occupancyReport(s: SparkSession, path: String): DataFrame =
    occupancyReportOf(occupancy(s, path))

  /** [[occupancyReport]] over any per-cell occupancy frame — the in-memory
    * path (the `ann_index_occupancy` gate oracles this cross-engine over
    * `cellOccupancy(encode(...))`, so the accounting itself is pinned, not
    * just produced).
    */
  def occupancyReportOf(occ: DataFrame): DataFrame =
    occ.agg(
      count(lit(1)).as("n_cells"),
      sum(col("n_vecs")).as("n_vecs"),
      max(col("n_vecs")).as("max_cell"),
      round(avg(col("n_vecs")), 2).as("mean_cell"),
      round(max(col("n_vecs")) / avg(col("n_vecs")), 2).as("imbalance"))

  /** Fold `delta` per-cell counts into the persisted occupancy table.
    * `replace = false` SUMS overlapping cells (append semantics);
    * `replace = true` expects `delta` to already carry the final counts
    * for every cell it mentions (upsert semantics — the caller rebuilt the
    * touched cells' counts). Tiny table (≤ k rows): checkpointed before
    * the overwrite.
    */
  private def mergeOccupancy(s: SparkSession, path: String, delta: DataFrame,
      replace: Boolean = false): Unit = {
    val occPath = snapshot(s, path).partPath("occupancy")
    val merged =
      if (replace) delta
      else occupancy(s, path).unionByName(delta)
        .groupBy(col("cell")).agg(sum(col("n_vecs")).as("n_vecs"))
    merged.localCheckpoint().write.mode("overwrite").parquet(occPath)
  }

  /** Codes with EVERY stored column (streaming `__batch` stamps included,
    * whichever files carry them) — [[loadCodes]] projects the search
    * schema; maintenance paths need the full rows to rewrite losslessly.
    */
  private[graft] def loadCodesFull(s: SparkSession, path: String): DataFrame =
    codesFullSchemaRead(s, snapshot(s, path).partPath("codes"))

  // ---- codes schema marker --------------------------------------------------
  //
  // The full-rows read used to pay `mergeSchema=true` — a distributed job
  // reading EVERY parquet footer under the codes directory — once per
  // mutation batch (upsert, streaming replay check, compaction). Bytes read
  // are O(files in the index): the metadata dual of the full-scan discovery
  // the id→cell sidecar already removed, and at 100 TB a per-micro-batch
  // full-footer pass by itself. Table formats solve this by holding the
  // schema in a manifest; this marker is that idea scaled to one file:
  // `_schema.json` INSIDE the codes directory (underscore-prefixed, so data
  // readers ignore it; it rides every staged-directory rename with the data
  // it describes) holds the union of every column set ever written there.
  //
  // INVARIANT (superset-first, the sidecar's discipline): a writer that may
  // ADD columns to a live directory (stamped appends, metadata-carrying
  // upserts) widens the marker BEFORE the data lands. Every crash window
  // then leaves at worst a marker claiming a column no file carries — an
  // explicit-schema read returns it as all-null, exactly what mergeSchema
  // returns for files lacking a column — never a marker missing a column
  // files DO carry (which would silently drop stamps from a lossless
  // rewrite). Single-writer (lease-enforced) like every mutation here.
  // Absence (legacy index, operator delete) falls back to mergeSchema —
  // always correct, just O(files).

  private val CodesSchemaMarker = "_schema.json"

  /** Read the codes directory with its full (union) schema: marker when
    * present — zero footer jobs — else the legacy all-footers mergeSchema.
    */
  private def codesFullSchemaRead(s: SparkSession, codesDir: String): DataFrame =
    readSchemaMarker(s, codesDir) match {
      case Some(st) => s.read.schema(st).parquet(codesDir)
      case None => s.read.option("mergeSchema", "true").parquet(codesDir)
    }

  private[graft] def readSchemaMarker(s: SparkSession,
      codesDir: String): Option[org.apache.spark.sql.types.StructType] = try {
    val fs = hadoopFs(s, codesDir)
    val p = new org.apache.hadoop.fs.Path(s"$codesDir/$CodesSchemaMarker")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      org.apache.spark.sql.types.DataType.fromJson(json) match {
        case st: org.apache.spark.sql.types.StructType => Some(st)
        case _ => None
      }
    }
  } catch { case _: Throwable => None } // torn/unreadable marker = absent

  /** Persist `schema` as the directory's full-rows read schema. Fields are
    * normalized nullable (files written before a column existed read it as
    * null — the mergeSchema semantics this replaces). tmp-write + rename so
    * a torn write is never read as truth (readSchemaMarker treats a parse
    * failure as absent anyway).
    */
  private def writeSchemaMarker(s: SparkSession, codesDir: String,
      schema: org.apache.spark.sql.types.StructType): Unit = try {
    val nullable = org.apache.spark.sql.types.StructType(
      schema.fields.map(_.copy(nullable = true)))
    val fs = hadoopFs(s, codesDir)
    val tmp = new org.apache.hadoop.fs.Path(s"$codesDir/.${CodesSchemaMarker}.tmp")
    val dst = new org.apache.hadoop.fs.Path(s"$codesDir/$CodesSchemaMarker")
    val out = fs.create(tmp, true)
    try out.write(nullable.json.getBytes("UTF-8")) finally out.close()
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) fs.delete(tmp, false)
    ()
  } catch { case _: Throwable => () } // marker is an optimization: absence is safe

  /** Widen a live directory's marker to cover `incoming`'s columns BEFORE
    * the data lands (see the superset-first invariant above). A directory
    * with no marker derives its current union once via the legacy footer
    * merge — the last time that cost is ever paid for this directory.
    */
  private def widenSchemaMarker(s: SparkSession, codesDir: String,
      incoming: org.apache.spark.sql.types.StructType): Unit = {
    val base = readSchemaMarker(s, codesDir).getOrElse(
      s.read.option("mergeSchema", "true").parquet(codesDir).schema)
    writeSchemaMarker(s, codesDir, unionSchemas(base, incoming))
  }

  /** Name-keyed field union, first-seen order and type. The writers here
    * never change a column's type; if debris ever disagrees, the read path
    * would fail as loudly as mergeSchema does on incompatible footers.
    */
  private[graft] def unionSchemas(a: org.apache.spark.sql.types.StructType,
      b: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.types.StructType = {
    val have = a.fieldNames.toSet
    org.apache.spark.sql.types.StructType(
      a.fields ++ b.fields.filterNot(f => have.contains(f.name)))
  }
}
