package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over similarity/dedup pair graphs.
  * [[DedupOps.nearDupClusters]] covers connectivity; this adds the
  * importance side: PageRank over the undirected pair graph — "which
  * documents sit at the center of a near-duplicate neighborhood" (the
  * canonical-pick / crawl-frontier signal at corpus scale).
  *
  * Scale shape: one iteration = one join of the edge list against the
  * current rank table (both keyed by the 8-byte node id) + one aggregate
  * back to node ids — the standard distributed PR step; nothing driver-
  * side grows with the graph. For deep iteration counts localCheckpoint
  * every few steps to keep lineage flat (the [[DedupOps.nearDupClusters]]
  * discipline); the gate runs the 2-iteration configuration its oracle
  * unrolls.
  *
  * Cross-engine FP discipline: per-edge contributions are rounded to 12
  * decimals and fixed as DECIMAL(28,12) BEFORE summation, so the
  * per-node sums are exact integer-scaled arithmetic in any accumulation
  * order; each new rank is one double multiply-add chain evaluated in a
  * fixed association + round(·,12). Every rank the operator ever emits
  * is therefore bit-identical across engines, partitionings and runs.
  */
object GraphOps {

  /** Default PageRank configuration — PUBLIC so the gate oracle derives
    * its unrolled iteration count and damping literal from the same
    * constants the operator defaults to (changing either here re-shapes
    * the DedupQueries oracle with it; they cannot silently desync).
    */
  val PrIters = 2
  val PrDamping = 0.85

  /** PageRank over an undirected pair graph `(doc_a, doc_b)` (each
    * undirected edge contributes both directions; every node therefore
    * has out-degree ≥ 1, so there are no dangling-mass corrections).
    *
    * DOMAIN: returns (doc_id, pr) only for nodes appearing in at least
    * one edge — ranks are initialized from the degree table, so isolated
    * documents are absent and the teleport mass is normalized over
    * edge-touching nodes. That is the right domain for dup-neighborhood
    * centrality (an isolated doc has no duplicate neighborhood to rank);
    * callers wanting corpus-wide centrality must union the isolated docs
    * back with rank (1−d)/n themselves.
    */
  def pageRank(pairs: DataFrame, iters: Int = PrIters,
      damping: Double = PrDamping): DataFrame = {
    OpContract.requireCols(pairs, "GraphOps.pageRank", "doc_a", "doc_b")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    // node count: one scalar aggregate — the only driver-side value
    val n = deg.count()
    val tele = (lit(1.0) - lit(damping)) / lit(n.toDouble)
    var pr = deg.select(col("src").as("doc_id"),
      round(lit(1.0) / lit(n.toDouble), 12).as("pr"))
    (0 until iters).foreach { _ =>
      val contribs = edges
        .join(pr, col("src") === col("doc_id"))
        .join(deg.withColumnRenamed("src", "dsrc"), col("src") === col("dsrc"))
        .select(col("dst"),
          round(col("pr") / col("deg").cast("double"), 12)
            .cast(DecimalType(28, 12)).as("c"))
      pr = contribs.groupBy("dst")
        .agg(sum(col("c")).as("csum"))
        .select(col("dst").as("doc_id"),
          round(tele + lit(damping) * col("csum").cast("double"), 12).as("pr"))
    }
    pr
  }

  /** Contamination BLAST RADIUS: starting from a seed set of flagged
    * documents, walk the (undirected) near-dup pair graph up to `maxHops`
    * and return every reachable doc with its minimum hop count — the
    * quarantine set. A benchmark-contaminated doc's near-duplicates (and
    * THEIR near-duplicates) carry the same leaked content through
    * paraphrase chains; quarantining only the directly-flagged docs
    * leaves the copies in the training mix.
    *
    * Frontier BFS, one round per hop: join the current frontier against
    * the id-pair edge list, anti-join out already-visited nodes,
    * `localCheckpoint` per round (the [[DedupOps.nearDupClustersStar]]
    * lineage discipline; reliable checkpointing on a cluster). Only
    * 8-byte ids move; rounds are bounded by `maxHops` and stop early on
    * an empty frontier. BFS order guarantees the first visit IS the
    * minimum hop count — no per-node min aggregation needed.
    *
    * Spark 4's `WITH RECURSIVE` expresses the same walk declaratively
    * (GraphOpsSpec pins result equality on the same edges); the explicit
    * frontier loop is kept as the library op because it checkpoints per
    * round and early-exits — the controls a 100 TB walk needs.
    *
    * `pairs`: (doc_a, doc_b) rows; `seeds`: doc_id rows. Output:
    * (doc_id, hops), seeds at hops = 0.
    */
  def quarantineSet(pairs: DataFrame, seeds: DataFrame, maxHops: Int = 3): DataFrame = {
    require(maxHops >= 0, s"maxHops >= 0, got $maxHops")
    OpContract.requireCols(pairs, "GraphOps.quarantineSet pairs", "doc_a", "doc_b")
    OpContract.requireCols(seeds, "GraphOps.quarantineSet seeds", "doc_id")
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .localCheckpoint()
    var visited = seeds.select(col("doc_id")).distinct()
      .withColumn("hops", lit(0L)).localCheckpoint()
    var frontier = visited
    var h = 0
    while (h < maxHops && !frontier.isEmpty) {
      h += 1
      frontier = edges
        .join(frontier.select(col("doc_id").as("src")), "src")
        .select(col("dst").as("doc_id")).distinct()
        .join(visited.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .withColumn("hops", lit(h.toLong))
        .localCheckpoint()
      visited = visited.union(frontier).localCheckpoint()
    }
    visited
  }
}
