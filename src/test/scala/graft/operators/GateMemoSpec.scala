package graft.operators

import graft.SparkTestBase

/** The gate-side shared-training memo: hit/miss identity and the
  * 2-entry LRU bound (ADVICE r12 — no unbounded checkpoint pinning).
  */
class GateMemoSpec extends SparkTestBase {

  test("cached: same (session, dir) returns the SAME DataFrame; builder runs once") {
    val memo = new GateMemo
    var builds = 0
    def build() = { builds += 1; spark.range(3).toDF() }
    val a = memo.cached(spark, "/d1")(build())
    val b = memo.cached(spark, "/d1")(build())
    assert(a eq b)
    assert(builds == 1)
    assert(a.count() == 3)
  }

  test("cached: distinct dirs train separately; LRU keeps only 2 entries") {
    val memo = new GateMemo
    var builds = 0
    def build(n: Int) = { builds += 1; spark.range(n).toDF() }
    val d1 = memo.cached(spark, "/d1")(build(1))
    memo.cached(spark, "/d2")(build(2))
    memo.cached(spark, "/d3")(build(3)) // evicts /d1 (eldest)
    assert(builds == 3)
    // /d2 and /d3 still cached
    memo.cached(spark, "/d2")(build(99))
    memo.cached(spark, "/d3")(build(99))
    assert(builds == 3)
    // /d1 was evicted -> rebuilt (a NEW DataFrame, same values)
    val d1again = memo.cached(spark, "/d1")(build(1))
    assert(builds == 4)
    assert(!(d1 eq d1again) && d1again.count() == 1)
  }
}
