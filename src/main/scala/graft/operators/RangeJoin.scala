package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyless interval containment join, made shuffle-joinable by binning —
  * the range-join technique Spark's open-source planner lacks (a plain
  * `p BETWEEN lo AND hi` predicate with no equality conjunct plans as
  * BroadcastNestedLoopJoin, which scans points × intervals and falls over
  * the moment neither side broadcasts).
  *
  * Construction: pick a bin width; a point lands in exactly ONE bin
  * (`p div w`), an interval EXPLODES to every bin it overlaps
  * (`lo div w .. hi div w`). Joining on the bin is then a plain equi-join
  * whose candidates are exactly the pairs sharing a bin; the containment
  * filter keeps the true matches. Because the point's bin is unique, each
  * matching (point, interval) pair is produced exactly once — NO
  * dedup step (the interval side is replicated across bins, but a given
  * point only meets the one replica in its own bin).
  *
  * Choosing `binWidth`: replication per interval is
  * `(hi − lo)/binWidth + 1` rows, candidate volume per bin is
  * points-per-bin × intervals-overlapping-bin. Set it near the typical
  * interval length — intervals then replicate ~2×, and the equi-join
  * shuffles both sides once on the bin key (SMJ/SHJ at any scale; PlanSpec
  * pins no nested loop). Heavily skewed bins (a hot time region) are the
  * standard [[SkewJoin]] salting case on the bin key.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * `[lo, hi]` (inclusive) contains its `pt`. All three bound columns
    * must be integral (µs timestamps, offsets — the engine's integer
    * time discipline). Output: the points columns + the intervals
    * columns (caller projects/renames beforehand; overlapping names are
    * rejected).
    */
  def intervalJoinBinned(points: DataFrame, intervals: DataFrame,
      pt: Column, lo: Column, hi: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"intervalJoinBinned: binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"intervalJoinBinned: overlapping column names ${overlap.mkString(", ")} — rename before joining")
    val p = points.withColumn("__bin", call_function("div", pt, lit(binWidth)))
    val iv = intervals
      .withColumn("__bin", explode(sequence(
        call_function("div", lo, lit(binWidth)),
        call_function("div", hi, lit(binWidth)))))
    p.join(iv, Seq("__bin"))
      .filter(pt >= lo && pt <= hi)
      .drop("__bin")
  }
}
