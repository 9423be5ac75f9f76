package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the trainer for the
  * centroid tables that SemDeDup cells ([[Dedup.semanticDuplicates]]) and
  * IVF coarse quantization (ann_ivf_coarse) consume. Both of those take
  * centroids as INPUT; this closes the loop so a pipeline can train cells
  * on the corpus itself (SemDeDup, Abbas et al. 2023, clusters with k-means
  * before the within-cell pass).
  *
  * Deterministic by construction, so the whole trainer is oracle-checkable:
  * seeds are the first k rows by id order; a FIXED iteration count (no
  * convergence test — the data-dependent stop would make run length
  * engine-visible); centroid updates round each component to 6 decimals
  * (avg accumulates in shuffle order; rounding makes the next iteration's
  * input bit-identical on any engine — same convention as
  * emb_label_centroids); assignment ties break on centroid id (ArgminL2's
  * first-wins over id-sorted centroids).
  *
  * Scale shape per iteration: assignment is the [[Dedup.assignCells]]
  * broadcast-argmin MAP pass (zero corpus shuffles); the update is one
  * (cell, pos) aggregation with map-side partials — the corpus is touched
  * exactly twice per iteration and never shuffled whole. Centroid state is
  * k rows: it lives as a localCheckpoint'd frame each round, which pins the
  * plan to constant size — an iterative loop whose generation feeds the
  * next TWICE (assignment + empty-cell fallback) would otherwise double
  * its logical plan every round (the [[Dedup.clusterRepresentatives]]
  * lesson; k rows make the checkpoint free).
  *
  * Storage note: the RETURNED centroid frame is localCheckpoint-pinned (k
  * rows) until the ContextCleaner collects it after the caller drops the
  * frame — `spark.catalog.clearCache()` does NOT free checkpoint storage,
  * so a long-lived session fitting repeatedly holds one k-row pin per
  * still-referenced result (superseded in-loop generations are dropped
  * eagerly each round; only the live result pins).
  *
  * @param k     number of clusters (centroid count)
  * @param iters fixed Lloyd iterations (assignment + mean update)
  * @return (cent_id, cent) — cent_id is the seeding row's id (stable
  *         labels across iterations), cent an array<double>
  */
object KMeans {

  def fit(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    var cents = df.orderBy(id).limit(k)
      .select(id.as("cent_id"), vec.cast("array<double>").as("cent"))
      .localCheckpoint()
    for (_ <- 0 until iters) {
      val assigned = Dedup.assignCells(df, id, vec, cents)
      val updated = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos"))
        .agg(round(avg(col("x").cast("double")), 6).as("c"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
        .select(col("cell").as("cent_id"),
          transform(col("pc"), p => p.getField("c")).as("newc"))
      // a cell that captured no points keeps its previous centroid (k is
      // preserved; the standard empty-cluster policy short of re-seeding)
      val next = cents
        .join(updated, Seq("cent_id"), "left")
        .select(col("cent_id"), coalesce(col("newc"), col("cent")).as("cent"))
        .localCheckpoint()
      Dedup.dropLocalCheckpoint(cents) // superseded generation (k rows)
      cents = next
    }
    cents
  }
}
