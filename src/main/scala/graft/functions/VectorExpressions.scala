package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native Catalyst expression for the vector hot path.
  *
  * The built-in route for an array dot product —
  * `aggregate(zip_with(a, b, (x,y) => x*y), 0d, (s,x) => s+x)` — evaluates
  * interpreted lambda closures per element per row (higher-order functions
  * are excluded from whole-stage codegen), which made the all-pairs cosine
  * scan the bench bottleneck (110 s at sf0.1). This expression generates a
  * tight primitive loop inside whole-stage codegen instead (~40× less work
  * per pair), while keeping the exact same left-to-right double accumulation
  * order — so results (and the DuckDB `list_dot_product` oracle parity) are
  * bit-identical to the fold it replaces.
  *
  * Accepts `array<float>` / `array<double>` on either side; accumulates in
  * double. Null elements are not expected (embedding columns); null arrays
  * propagate null.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = DotProduct.checkedLength(a.numElements(), b.numElements())
    val aF = elemType(left) == FloatType
    val bF = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
      val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
      s"""
         |int $n = graft.functions.DotProduct.checkedLength($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $a.$aGet($i) * (double) $b.$bGet($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Mismatched dimensions fail fast — silently truncating to the shorter
    * array would produce plausible-looking but wrong similarities for
    * corrupt/mixed-dimension embedding data (and DuckDB's list_dot_product
    * errors on mismatch, so the oracle would desync anyway).
    */
  def checkedLength(a: Int, b: Int): Int = {
    if (a != b)
      throw new IllegalArgumentException(
        s"dot_product: array length mismatch ($a vs $b)")
    a
  }
}

/** ALL random-hyperplane LSH signatures for one vector in ONE expression
  * node. The per-table composition (`array((0 until tables).map(l =>
  * lshSignature(v, seed + l*131, bits)))`) carries tables·bits literal
  * 64-double hyperplane arrays INSIDE the expression tree — the tree
  * itself becomes hundreds of KB, and every query that contains it pays
  * seconds of Catalyst planning + codegen source generation BEFORE any
  * data moves (measured: the signature projection alone cost ~1.6-2 s
  * per query at sf0.1 with literal planes, independent of row count).
  * Here the plane matrix is a constructor-derived `@transient` field,
  * shipped via `addReferenceObj`: the tree is ONE node, planning is
  * O(1), and the generated code is a tight flat-array loop.
  *
  * Semantics are bit-identical to the per-table form: table `l` uses
  * seed `seed + l*131`, bit `j` of its signature is set iff
  * `v · r_{l,j} > 0` with `r_{l,j}[i] = uniform(seed + l*131, j, 0, i)
  * − 0.5`, dots accumulate left-to-right in double — the exact
  * arithmetic the DuckDB oracle regenerates via `uniformSql`.
  */
case class LshSignatures(child: Expression, seed: Long, tables: Int,
    bits: Int, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _)
        if tables >= 1 && bits >= 1 && bits <= 30 && dim >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures expects array<float|double> with tables >= 1, 1 <= bits <= 30, got " +
        s"${child.dataType} / tables=$tables bits=$bits dim=$dim")
  }

  @transient private lazy val planes: Array[Double] =
    LshSignatures.planesFor(seed, tables, bits, dim)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    LshSignatures.signatures(v.asInstanceOf[ArrayData], isFloat, planes, tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshSignatures.signatures($v, $isFloat, $p, $tables, $bits);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshSignatures {
  import graft.core.DeterministicRng
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** Flat [table][bit][dim] hyperplane matrix — model constants derived
    * from the counter-based RNG, computed once per expression instance
    * on the driver.
    */
  def planesFor(seed: Long, tables: Int, bits: Int, dim: Int): Array[Double] = {
    val out = new Array[Double](tables * bits * dim)
    var k = 0
    for (l <- 0 until tables; j <- 0 until bits; i <- 0 until dim) {
      out(k) = DeterministicRng.uniform(seed + l * 131L, j.toLong, 0L, i.toLong) - 0.5
      k += 1
    }
    out
  }

  /** Shared by interpreted eval and codegen — one definition, no drift. */
  def signatures(a: ArrayData, isFloat: Boolean, planes: Array[Double],
      tables: Int, bits: Int): ArrayData = {
    val dim = planes.length / (tables * bits)
    val n = DotProduct.checkedLength(a.numElements(), dim)
    val out = new Array[Int](tables)
    var base = 0
    var l = 0
    while (l < tables) {
      var sig = 0
      var j = 0
      while (j < bits) {
        var s = 0.0
        var i = 0
        while (i < n) {
          val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
          s += x * planes(base + i)
          i += 1
        }
        if (s > 0.0) sig += (1 << j)
        j += 1
        base += dim
      }
      out(l) = sig
      l += 1
    }
    new GenericArrayData(out)
  }
}

object VectorFunctions {
  // Spark 4 made Column representation-agnostic; the bridge converts
  // Column <-> catalyst Expression (see graftbridge.Bridge).
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Column API for [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))

  /** Column API for [[LshSignatures]] — the array of all `tables`
    * signatures for one vector.
    */
  def lsh_signatures(v: Column, seed: Long, tables: Int, bits: Int,
      dim: Int): Column =
    column(LshSignatures(expression(v), seed, tables, bits, dim))

  /** Cosine similarity on top of the native dot product, rounded to 6
    * decimals (cross-engine FP discipline — see SimilarityQueries).
    */
  def cosine_similarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.{round, sqrt}
    round(dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b))), 6)
  }
}
