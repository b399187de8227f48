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

  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      salts: Int = 16): DataFrame = {
    require(salts >= 1)
    // left: random-but-deterministic salt per row (hash of whole row id via
    // monotonic id is nondeterministic across retries — use a hash of the key
    // plus a per-row uniform; pmod(xxhash64, salts) over all columns is the
    // deterministic choice)
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated,
        leftKey === rightKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }
}
