package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.10 / A9): custom aggregations via
  * `Aggregator[IN, BUF, OUT]`, the public API that compiles to the same
  * partial+final ObjectHashAggregate shape as built-ins — the buffer
  * merges associatively, so these parallelize like any Spark aggregate.
  * None of these is needed for reference parity (§4.3: built-ins cover
  * it); they document the extension seam with working examples.
  */
object TypedAggregators {

  /** Weighted mean: Σwx / Σw, merging partial (Σwx, Σw) pairs. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** MinHash signature aggregator: element-wise min of per-shingle hash
    * vectors — the typed-Aggregator formulation of ext.Dedup's HOF
    * pipeline (SURVEY.md §4.3's optional custom aggregate). Buffers are
    * fixed-width Long arrays; merge is element-wise min (associative,
    * commutative ⇒ partial aggregation safe). */
  class MinHashSignature(k: Int) extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    override def reduce(buf: Array[Long], hashes: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k && i < hashes.length) {
        if (hashes(i) < buf(i)) buf(i) = hashes(i)
        i += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)
    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }
}
