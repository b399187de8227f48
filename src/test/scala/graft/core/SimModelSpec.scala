package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Statistical validation of the model library against theory (SURVEY §5.2
  * item 3): the properties the DuckDB oracle can't check for GBM (libm FP
  * drift) and distributional sanity for the walk.
  */
class SimModelSpec extends SparkTestBase {

  test("gbm: mean and variance of final price match lognormal theory") {
    val (mu, sigma, dt, n, s0) = (0.05, 0.2, 1.0 / 252, 32, 100.0)
    val t = n * dt
    val specs = Seq(SimulationSpec(0, "gbm", 4000, n, Seq(mu, sigma, dt), Seq(s0.toString), 7))
    val fin = new MCBattery(spark).simulate(specs)
      .select(element_at(col("trace"), -1).cast("double").as("f"))
      .agg(avg(col("f")), stddev_pop(col("f"))).collect()(0)
    val (mean, sd) = (fin.getDouble(0), fin.getDouble(1))
    val expMean = s0 * math.exp(mu * t)
    val expSd = expMean * math.sqrt(math.exp(sigma * sigma * t) - 1)
    // 4000 sims: SE of mean ≈ expSd/63 — allow 4 SEs; sd within 10%
    assert(math.abs(mean - expMean) < 4 * expSd / math.sqrt(4000), s"mean=$mean exp=$expMean")
    assert(math.abs(sd - expSd) / expSd < 0.10, s"sd=$sd exp=$expSd")
  }

  test("walk: endpoint mean and variance match binomial theory") {
    val (bias, n, sims) = (0.55, 24, 4000)
    val specs = Seq(SimulationSpec(0, "random_walk", sims, n, Seq(bias), Nil, 9))
    val r = new MCBattery(spark).simulate(specs)
      .select(element_at(col("trace"), -1).cast("double").as("f"))
      .agg(avg(col("f")), stddev_pop(col("f"))).collect()(0)
    val expMean = n * (2 * bias - 1)
    val expSd = math.sqrt(4.0 * n * bias * (1 - bias))
    assert(math.abs(r.getDouble(0) - expMean) < 4 * expSd / math.sqrt(sims))
    assert(math.abs(r.getDouble(1) - expSd) / expSd < 0.10)
  }

  test("sim_nwalk_final matches Irwin-Hall normal-walk theory") {
    // 16 steps of ~N(0,1) increments: E[final]=0, Var[final]=16
    val rows = graft.SparkEntry.queries("sim_nwalk_final")(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (mean, varr, n) = (r.getDouble(1), r.getDouble(2), r.getLong(3))
      assert(math.abs(mean) < 4 * math.sqrt(16.0 / n), s"mean=$mean")
      assert(math.abs(varr - 16.0) < 4 * 16.0 * math.sqrt(2.0 / (n - 1)), s"var=$varr")
    }
  }

  test("sim_gbm_logret matches drift theory") {
    import graft.operators.GbmLogRet
    val rows = graft.SparkEntry.queries("sim_gbm_logret")(spark, sfDir).collect()
    assert(rows.length == 2)
    val expMean = GbmLogRet.driftTotal(16)
    val se = GbmLogRet.vol * math.sqrt(16.0 / 1000)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - expMean) < 4 * se, s"mean=${r.getDouble(1)}")
      assert(r.getDouble(2) < r.getDouble(1) && r.getDouble(1) < r.getDouble(3))
    }
  }

  test("sim_gbm_stats query returns sane rows") {
    val rows = graft.SparkEntry.queries("sim_gbm_stats")(spark, sfDir).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getLong(1) == 2000)
      assert(r.getDouble(2) > 80 && r.getDouble(2) < 120) // mean near s0 over ~1.5 months
      assert(r.getDouble(4) < r.getDouble(2))             // p05 below the mean
    }
  }
}
