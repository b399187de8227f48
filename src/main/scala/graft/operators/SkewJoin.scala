package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * On a shuffle join, all rows of one key land in one task; a hot key (the
  * classic 100 TB failure mode: one user/document/null key holding 1% of the
  * table) stalls the stage and can OOM the task. Salting splits each hot
  * left-side key across `salts` sub-partitions and replicates the matching
  * right-side rows to every salt, turning one huge task into `salts` normal
  * ones. AQE's skew-join handling does this adaptively for sort-merge joins;
  * this utility is the explicit form — needed when AQE can't kick in
  * (non-SMJ plans, aggregate-after-join pipelines) or when the skew is known
  * ahead of time.
  *
  * Semantics: identical to `left.join(right, leftKey === rightKey, "inner")`
  * (asserted in SkewJoinSpec); cost: right side is replicated `salts`×, so
  * use for a small-ish build side or restrict to the hot keys.
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      salts: Int = 16): DataFrame = {
    require(salts >= 1)
    require(!left.columns.contains(SaltCol) && !right.columns.contains(SaltCol),
      s"inputs must not already have a $SaltCol column")
    // rand(seed) is the salt source because it varies across IDENTICAL rows
    // (a content hash would send all duplicates of the hot key to one salt,
    // defeating the split); the salt value never affects the join RESULT —
    // every salt matches exactly one replica of the right row — only the
    // shuffle distribution. RETRY CAVEAT: rand() is deterministic only if
    // the left input's per-partition row ORDER is deterministic (file scans
    // yes; shuffle outputs no). Feeding a shuffle-produced left side risks
    // duplicated/dropped rows under partial stage retries — for that case
    // materialize the left side first, or prefer AQE's skew-join handling,
    // which is retry-safe. No content-deterministic salt can split identical
    // rows, so this trade-off is inherent to explicit salting.
    val salted = left.withColumn(SaltCol,
      floor(rand(42) * salts).cast("int"))
    val replicated = right.withColumn(SaltCol,
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        leftKey === rightKey && salted(SaltCol) === replicated(SaltCol))
      .drop(SaltCol)
  }
}
