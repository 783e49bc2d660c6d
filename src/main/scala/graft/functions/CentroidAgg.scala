package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Mutable aggregation buffer: element count + per-dimension sums
  * (sized lazily from the first vector seen).
  */
final case class CentroidBuf(var n: Long, var sums: Array[Double])

/** Typed UDAF (SURVEY.md §2B UDF/UDAF surface): exact centroid of an
  * `array<double>` embedding column via `Aggregator[IN, BUF, OUT]` —
  * the Dataset-native aggregation extension point (Spark plans it as
  * a regular two-phase hash aggregate: partial buffers map-side,
  * merge after the shuffle, so it scales like any built-in agg).
  */
object CentroidAgg extends Aggregator[Seq[Double], CentroidBuf, Seq[Double]] {

  override def zero: CentroidBuf = CentroidBuf(0L, Array.emptyDoubleArray)

  override def reduce(b: CentroidBuf, a: Seq[Double]): CentroidBuf = {
    if (b.sums.length == 0) b.sums = new Array[Double](a.length)
    require(a.length == b.sums.length,
      s"centroid over ragged dimensions: saw a ${a.length}-dim vector " +
        s"after ${b.sums.length}-dim input; pad or filter to one width first")
    var i = 0
    while (i < b.sums.length) {
      b.sums(i) += a(i)
      i += 1
    }
    b.n += 1
    b
  }

  override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
    if (x.sums.length == 0) y
    else if (y.sums.length == 0) x
    else {
      require(x.sums.length == y.sums.length,
        s"centroid over ragged dimensions: merging ${x.sums.length}-dim " +
          s"and ${y.sums.length}-dim partial buffers")
      var i = 0
      while (i < x.sums.length) {
        x.sums(i) += y.sums(i)
        i += 1
      }
      x.n += y.n
      x
    }
  }

  override def finish(b: CentroidBuf): Seq[Double] =
    if (b.n == 0) Seq.empty else b.sums.toSeq.map(_ / b.n)

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Untyped Column form for DataFrame `groupBy(...).agg(...)`. */
  def asUdaf: Column => Column = {
    val u = functions.udaf(CentroidAgg, ExpressionEncoder[Seq[Double]]())
    c => u(c)
  }
}
