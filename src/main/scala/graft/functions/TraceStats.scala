package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Single-pass numeric trace statistics (SURVEY §4.2 / §7.3: the typed-UDAF
  * tier). One pass maintains count/sum/sum-of-squares/min/max; mean and
  * population variance derive at the end. Where built-ins would run separate
  * avg/var/min/max aggregates, this is one buffer — the shape you want when
  * the exploded trace table is 100 TB and every extra aggregate is another
  * pass over shuffle output.
  *
  * Exactness note: for integer-valued inputs (coin 0/1, walk positions) sum
  * and sumSq stay exact in doubles (< 2^53), so mean/variance are single
  * correctly-rounded divisions — DuckDB-oracle comparable.
  */
object TraceStats {

  final case class Buf(n: Long, sum: Double, sumSq: Double, min: Double, max: Double)
  final case class Stats(n_points: Long, mean: Double, variance: Double,
      min_v: Double, max_v: Double)

  val agg: Aggregator[Double, Buf, Stats] = new Aggregator[Double, Buf, Stats] {
    def zero: Buf = Buf(0L, 0.0, 0.0, Double.PositiveInfinity, Double.NegativeInfinity)
    def reduce(b: Buf, v: Double): Buf =
      Buf(b.n + 1, b.sum + v, b.sumSq + v * v, math.min(b.min, v), math.max(b.max, v))
    def merge(a: Buf, b: Buf): Buf =
      Buf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq,
        math.min(a.min, b.min), math.max(a.max, b.max))
    def finish(b: Buf): Stats = {
      // empty input yields NaN moments and infinite extremes (like dividing
      // by COUNT(*)=0); callers aggregating possibly-empty groups should
      // filter first — matches the semantics of sum/count-derived stats
      val mean = b.sum / b.n
      Stats(b.n, mean, (b.sumSq - b.sum * b.sum / b.n) / b.n, b.min, b.max)
    }
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  /** The same aggregator over any input type via an extractor (Aggregator
    * has no contramap).
    */
  def aggOn[I](f: I => Double): Aggregator[I, Buf, Stats] = new Aggregator[I, Buf, Stats] {
    def zero: Buf = agg.zero
    def reduce(b: Buf, v: I): Buf = agg.reduce(b, f(v))
    def merge(a: Buf, b: Buf): Buf = agg.merge(a, b)
    def finish(b: Buf): Stats = agg.finish(b)
    def bufferEncoder: Encoder[Buf] = agg.bufferEncoder
    def outputEncoder: Encoder[Stats] = agg.outputEncoder
  }
}
