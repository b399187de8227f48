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

  /** Triangle census of the near-dup pair graph — the graph-QA readout
    * next to connectivity ([[DedupOps.nearDupClusters]]) and centrality
    * ([[pageRank]]): `triangles` counts closed triples, `wedges` open
    * ones, and the global clustering coefficient `3·T/W` says whether
    * dup clusters are clique-like (true duplicate sets transitively agree
    * → coefficient near 1) or chain-like (threshold-grazing near-dups
    * that do NOT transitively agree — the cluster-quality smell that
    * makes min-label components over-merge). One summary row:
    * `(n_edges, triangles, wedges, global_clustering)`.
    *
    * Algorithm (Suri & Vassilvitskii WWW'11 degree orientation): each
    * undirected edge is directed from its lower-degree endpoint (ties by
    * id), so every node's out-neighborhood is O(√m) on any graph; wedges
    * are built by self-joining the oriented list on the source and closed
    * by one hash join against the canonical edge set — each triangle is
    * counted exactly once, no node ever enumerates a hub's full
    * neighborhood. `wedges` comes straight off the degree table
    * (Σ d·(d−1)/2, exact integers).
    *
    * Exactness: counts are exact integers; the coefficient is ONE
    * division of exact integers (NULL when the graph has no wedges) —
    * engine-identical. Input `pairs`: (doc_a, doc_b), doc_a < doc_b
    * canonical, one row per undirected edge (dups are collapsed here).
    */
  def triangleStats(pairs: DataFrame): DataFrame = {
    OpContract.requireCols(pairs, "GraphOps.triangleStats", "doc_a", "doc_b")
    val e = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .filter(col("a") =!= col("b")).distinct().localCheckpoint()
    val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
    val wedge = oriented.as("x")
      .join(oriented.as("y"),
        col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
      .select(col("x.dst").as("wa"), col("y.dst").as("wb"))
    // close each wedge against the canonical edge set: distinct oriented
    // wedges map 1:1 to candidate (wa, wb) closures, and each closed
    // wedge is exactly one triangle (counted once — the orientation makes
    // the wedge apex the triangle's unique lowest-degree corner)
    val triCnt = wedge
      .join(e.select(col("a").as("wa"), col("b").as("wb")), Seq("wa", "wb"))
      .agg(count(lit(1)).as("triangles"))
    val degAgg = deg.agg(
      sum(expr("d * (d - 1) div 2")).as("wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    nEdges.crossJoin(broadcast(triCnt)).crossJoin(broadcast(degAgg))
      .select(col("n_edges"), col("triangles"), col("wedges"),
        when(col("wedges") > 0,
          (lit(3) * col("triangles")).cast("double") /
            col("wedges").cast("double")).as("global_clustering"))
  }
}
