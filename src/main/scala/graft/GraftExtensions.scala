package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Md5Int60, WordShingles}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions, so `spark.sql` users get them too:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_dot_product(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_dot_product"),
      info("graft_dot_product", "_FUNC_(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_md5int60"),
      info("graft_md5int60", "_FUNC_(s) - top 60 bits of md5(s) as bigint"),
      (args: Seq[Expression]) => Md5Int60(args(0))))
    e.injectFunction((FunctionIdentifier("graft_word_shingles"),
      info("graft_word_shingles", "_FUNC_(s, n) - distinct n-word shingles"),
      (args: Seq[Expression]) => {
        if (args.length != 2)
          throw new IllegalArgumentException(
            s"graft_word_shingles(text, n) expects 2 arguments, got ${args.length}")
        if (!args(1).foldable)
          throw new IllegalArgumentException(
            "graft_word_shingles: n must be a literal integer")
        val n = args(1).eval() match {
          case i: java.lang.Integer => i.intValue()
          case l: java.lang.Long => l.intValue()
          case s: java.lang.Short => s.intValue()
          case other => throw new IllegalArgumentException(
            s"graft_word_shingles: n must be an integer literal, got $other")
        }
        WordShingles(args(0), n)
      }))
  }
}
