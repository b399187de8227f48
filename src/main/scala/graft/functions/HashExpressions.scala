package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static helper the generated code calls into (top-level Scala objects get
  * Java static forwarders). MessageDigest is not thread-safe → thread-local.
  */
object Md5Int60Helper {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Top 60 bits of md5 as a non-negative long — numerically identical to
    * `conv(substr(md5(s), 1, 15), 16, 10)`: the first 15 hex chars are the
    * top 60 bits of the first 8 digest bytes (big-endian), i.e. `>>> 4`.
    */
  def hash(s: UTF8String): Long = {
    val digest = md.get()
    digest.reset()
    val bytes = digest.digest(s.getBytes)
    java.nio.ByteBuffer.wrap(bytes).getLong >>> 4
  }
}

/** Static helper for [[WordShingles]]. */
object WordShinglesHelper {
  import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

  /** Distinct n-word shingles of a single-space-tokenized string. Equivalent
    * to `array_distinct(transform(sequence(0, size(w)-n), i -> concat_ws(' ',
    * w[i+1..i+n])))` over `w = split(text, ' ')` — the composable form this
    * replaces evaluated three interpreted lambdas per shingle (~4 s per pass
    * over sf0.1's 1.5 M shingles); this is one pass over the string.
    */
  def shingles(s: UTF8String, n: Int): ArrayData = shingles(s, n, distinct = true)

  def shingles(s: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // limit = -1 keeps trailing empty tokens — matching Spark SQL's
    // split(text, ' ') and DuckDB's string_split (plain split(' ') drops
    // them, which would silently desync shingle sets from the oracle for
    // documents with trailing spaces)
    val words = s.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    def build(i: Int): String = {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
      sb.toString
    }
    if (distinct) {
      val set = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i + n <= words.length) { set.add(build(i)); i += 1 }
      val out = new Array[Any](set.size)
      val it = set.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    } else {
      // positional mode: every shingle in document order (winnowing needs
      // positions, so duplicates stay)
      val out = new Array[Any](words.length - n + 1)
      var i = 0
      while (i + n <= words.length) { out(i) = UTF8String.fromString(build(i)); i += 1 }
      new GenericArrayData(out)
    }
  }
}

/** Native word-shingle generator (see [[WordShinglesHelper.shingles]]);
  * `distinct = false` gives the positional (in-order, duplicates kept)
  * form that winnowing needs.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"word_shingles expects string (n>=1), got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    WordShinglesHelper.shingles(v.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShinglesHelper.shingles($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native form of the cross-engine 60-bit md5 hash (CrossHash.mdint).
  *
  * The composable route — `conv(substring(md5(c), 1, 15), 16, 10)` — goes
  * through hex-string materialization and BigInteger parsing per row
  * (~3.7 µs; 5.5 s over the 1.5 M shingles of sf0.1 dedup). This expression
  * digests once and extracts the top 60 bits directly (~0.4 µs), inside
  * whole-stage codegen. Values are bit-identical to the composed form, so
  * the DuckDB oracle (`('0x' || substr(md5(x),1,15))::BIGINT`) is unchanged.
  */
case class Md5Int60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5int60 expects string, got $t")
  }

  override protected def nullSafeEval(v: Any): Any =
    Md5Int60Helper.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Int60Helper.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
