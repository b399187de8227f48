package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static generation kernel shared by interpreted eval and generated code.
  *
  * Each kernel opens ONE [[Rngs.stream]] per trace row and consumes draws
  * in step order — for the counter-based families this yields exactly the
  * draws `Rngs.uniform(familyId, …, step)` would (the stream is a step
  * counter over the same function), and it is what lets the sequential
  * SFC64/MT19937 backends run at full fidelity: the whole trace is
  * generated inside one kernel invocation, so no cross-step stateless
  * access is ever needed.
  */
object McGenHelper {
  private val H = UTF8String.fromString("H")
  private val T = UTF8String.fromString("T")

  def coinTrace(seed: Long, model: Long, sim: Long, n: Int, bias: Double,
      prefix: Array[UTF8String], familyId: Int): ArrayData = {
    val out = new Array[Any](prefix.length + n)
    var i = 0
    while (i < prefix.length) { out(i) = prefix(i); i += 1 }
    val rs = Rngs.stream(familyId, seed, model, sim)
    var step = 0
    while (step < n) {
      out(prefix.length + step) = if (rs.next() < bias) H else T
      step += 1
    }
    new GenericArrayData(out)
  }

  /** GBM prices in one cumulative LOG-SPACE loop: acc += drift + vol·Z_t,
    * point t = S₀·exp(acc), Z from Box-Muller over stream draws (2t, 2t+1)
    * — the exact evaluation order of both the typed tier
    * ([[graft.core.GeometricBrownianMotion.simulate]]) and the composable
    * `transform(sequence, t -> exp(aggregate(...)))` form this replaces,
    * which re-folded the whole prefix per point (O(n²) uniform draws in
    * interpreted lambdas). Double.toString matches Spark's double→string
    * cast, so traces are bit-identical across tiers (ModelTierSpec).
    */
  def gbmTrace(seed: Long, model: Long, sim: Long, n: Int, drift: Double,
      vol: Double, s0: Double, familyId: Int): ArrayData = {
    val out = new Array[Any](n)
    val rs = Rngs.stream(familyId, seed, model, sim)
    var acc = 0.0
    var t = 0
    while (t < n) {
      val u1 = math.max(rs.next(), 1e-300)
      val u2 = rs.next()
      val z = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
      acc += drift + vol * z
      out(t) = UTF8String.fromString(java.lang.Double.toString(s0 * math.exp(acc)))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Random-walk positions in one cumulative loop (vs the O(n²) prefix-sum
    * fold of the composable form). Long.toString matches Spark's
    * long→string cast, so values are unchanged.
    */
  def walkTrace(seed: Long, model: Long, sim: Long, n: Int, bias: Double,
      origin: Long, familyId: Int): ArrayData = {
    val out = new Array[Any](n)
    val rs = Rngs.stream(familyId, seed, model, sim)
    var pos = origin
    var step = 0
    while (step < n) {
      pos += (if (rs.next() < bias) 1L else -1L)
      out(step) = UTF8String.fromString(java.lang.Long.toString(pos))
      step += 1
    }
    new GenericArrayData(out)
  }
}

/** Native coin-trace generator: the whole trace (starting point + n flips)
  * in one tight loop per row, inside codegen. Replaces the
  * `transform(sequence(...), step -> CASE WHEN uniform < bias ...)` form,
  * whose lambda is interpreted per point. Values are identical (same
  * counter-hash per (seed, model, sim, step)), so the DuckDB trace oracle is
  * unchanged — asserted by sim_coin_traces in the correctness gate.
  */
case class CoinTrace(seed: Expression, model: Expression, sim: Expression,
    numberPoints: Int, bias: Double, prefix: Seq[String], familyId: Int = 0)
  extends TernaryExpression {

  override def first: Expression = seed
  override def second: Expression = model
  override def third: Expression = sim

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(seed, model, sim).forall(_.dataType == LongType) && numberPoints >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"coin_trace expects (bigint, bigint, bigint) counters, points >= 1")

  @transient private lazy val prefixArr: Array[UTF8String] =
    prefix.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(s: Any, m: Any, si: Any): Any =
    McGenHelper.coinTrace(s.asInstanceOf[Long], m.asInstanceOf[Long],
      si.asInstanceOf[Long], numberPoints, bias, prefixArr, familyId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pref = ctx.addReferenceObj("prefix", prefixArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, (s, m, si) => {
      s"${ev.value} = graft.core.McGenHelper.coinTrace($s, $m, $si, " +
        s"$numberPoints, ${bias}D, $pref, $familyId);"
    })
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(seed = newFirst, model = newSecond, sim = newThird)
}

/** Native geometric-Brownian-motion generator (see [[McGenHelper.gbmTrace]]). */
case class GbmTrace(seed: Expression, model: Expression, sim: Expression,
    numberPoints: Int, drift: Double, vol: Double, s0: Double, familyId: Int = 0)
  extends TernaryExpression {

  override def first: Expression = seed
  override def second: Expression = model
  override def third: Expression = sim

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(seed, model, sim).forall(_.dataType == LongType) && numberPoints >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gbm_trace expects (bigint, bigint, bigint) counters, points >= 1")

  override protected def nullSafeEval(s: Any, m: Any, si: Any): Any =
    McGenHelper.gbmTrace(s.asInstanceOf[Long], m.asInstanceOf[Long],
      si.asInstanceOf[Long], numberPoints, drift, vol, s0, familyId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m, si) => {
      s"${ev.value} = graft.core.McGenHelper.gbmTrace($s, $m, $si, " +
        s"$numberPoints, ${drift}D, ${vol}D, ${s0}D, $familyId);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(seed = newFirst, model = newSecond, sim = newThird)
}

/** Native random-walk generator (see [[McGenHelper.walkTrace]]). */
case class WalkTrace(seed: Expression, model: Expression, sim: Expression,
    numberPoints: Int, bias: Double, startPos: Long, familyId: Int = 0)
  extends TernaryExpression {

  override def first: Expression = seed
  override def second: Expression = model
  override def third: Expression = sim

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(seed, model, sim).forall(_.dataType == LongType) && numberPoints >= 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"walk_trace expects (bigint, bigint, bigint) counters, points >= 1")

  override protected def nullSafeEval(s: Any, m: Any, si: Any): Any =
    McGenHelper.walkTrace(s.asInstanceOf[Long], m.asInstanceOf[Long],
      si.asInstanceOf[Long], numberPoints, bias, startPos, familyId)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m, si) => {
      s"${ev.value} = graft.core.McGenHelper.walkTrace($s, $m, $si, " +
        s"$numberPoints, ${bias}D, ${startPos}L, $familyId);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(seed = newFirst, model = newSecond, sim = newThird)
}

/** Native per-family uniform draw — the SQL-surface form of
  * [[Rngs.uniform]]: any registered family's generator callable from
  * plain SQL at a (seed, model, sim, step) counter, inside whole-stage
  * codegen (the generated code is one static call). Registered as
  * `graft_rng_uniform(family, seed, model, sim, step)` by
  * [[graft.GraftExtensions]]. Families PCG64/Philox/CounterHash draw in
  * O(1); the sequential SFC64/MT19937 backends cost O(step) per call
  * (documented on [[Rngs]]) — use them through the battery/stream tiers
  * for bulk generation.
  */
case class RngUniform(seed: Expression, model: Expression, sim: Expression,
    step: Expression, familyId: Int)
  extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def first: Expression = seed
  override def second: Expression = model
  override def third: Expression = sim
  override def fourth: Expression = step

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(seed, model, sim, step).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "rng_uniform expects (bigint, bigint, bigint, bigint) counters")

  override protected def nullSafeEval(s: Any, m: Any, si: Any, st: Any): Any =
    Rngs.uniform(familyId, s.asInstanceOf[Long], m.asInstanceOf[Long],
      si.asInstanceOf[Long], st.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m, si, st) =>
      s"${ev.value} = graft.core.Rngs.uniform($familyId, $s, $m, $si, $st);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(seed = newFirst, model = newSecond, sim = newThird, step = newFourth)
}
