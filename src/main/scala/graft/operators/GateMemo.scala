package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tiny LRU memo for GATE-SIDE shared model state — the shared-Lloyd
  * pattern (VERDICT r11 #6 / r12 #2) as one reusable piece: several
  * gates in a battery re-derive the identical deterministic training
  * table (Lloyd centroids, BPE merges) from the same (session, sf-dir)
  * input; training once and pinning the result with `localCheckpoint`
  * removes repeated training cost from gates whose MEASURED work is the
  * downstream op, without touching op code or oracles (training is
  * deterministic, so the shared table is bit-identical to what each gate
  * would train alone).
  *
  * Bounded on purpose (ADVICE r12): an unbounded map keyed by
  * (session, dir) holds checkpoint blocks for the life of the JVM if
  * many sf dirs are visited in one session. A 2-entry LRU covers the
  * battery (one dir) and an A/B pair (two dirs); evicted entries drop
  * their only reference, and localCheckpoint RDD blocks are reclaimed
  * by Spark's ContextCleaner once the RDD is unreferenced — no explicit
  * unpersist hook exists or is needed.
  */
private[operators] final class GateMemo {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame]): Boolean =
        size() > 2
    }

  /** Memoized checkpoint of `train` keyed by the LIVE (session, dir,
    * shuffle-partitions) triple — a new session or a different sf dir
    * never reuses a stale plan, and the partitions component keeps the
    * determinism sweep HONEST: DeterminismSpec re-runs every gate at
    * shuffle.partitions 4 vs 32 in one session, and a memo keyed only
    * by (session, dir) would hand the 32-partition pass the 4-partition
    * training verbatim — silently exempting the training computation
    * from the sweep's bit-identity claim. The builder result is
    * `localCheckpoint`-pinned so each caller gate still measures
    * exactly its own downstream work.
    */
  def cached(s: SparkSession, d: String)(train: => DataFrame): DataFrame =
    m.synchronized {
      val k = (s, d, s.conf.get("spark.sql.shuffle.partitions", ""))
      val hit = m.get(k)
      if (hit != null) hit
      else {
        val v = train.localCheckpoint()
        m.put(k, v)
        v
      }
    }
}

/** [[GateMemo]] for DRIVER-VALUE model state (e.g. the PQ codebooks —
  * a [[SimilarityOps.PqModel]] Seq, not a DataFrame): same 2-entry LRU,
  * same (session, dir, shuffle-partitions) key so the determinism sweep
  * re-trains per partitioning, but no checkpoint — the value holds no
  * Spark resources at all.
  */
private[operators] final class ValueMemo[A <: AnyRef] {
  private val m =
    new java.util.LinkedHashMap[(SparkSession, String, String), A](8, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), A]): Boolean =
        size() > 2
    }

  def cached(s: SparkSession, d: String)(build: => A): A =
    m.synchronized {
      val k = (s, d, s.conf.get("spark.sql.shuffle.partitions", ""))
      val hit = m.get(k)
      if (hit != null) hit
      else {
        val v = build
        m.put(k, v)
        v
      }
    }
}
