package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.util.hashing.MurmurHash3

/** Mergeable sketches — the reference's approximate-aggregation slot:
  * topn_ddcm count-min sketch (`engine/executor/count_min_sketch.go:61`,
  * `ddcm.go`) and the OGSketch quantile family (`ogsketch.go`).
  *
  * A Spark `Aggregator[IN, BUF, OUT]` is exactly the mergeable-sketch
  * contract: `reduce` = point update, `merge` = sketch union — so partial
  * sketches combine map-side and the shuffle carries one (depth×width)
  * array per partition regardless of input size. That is the 100 TB
  * heavy-hitters shape: no shuffle of raw keys at all.
  * (Quantiles: Spark's built-in `percentile_approx` covers the OGSketch
  * use; SURVEY §4.3-3 accepts non-bit-identical approximation.)
  */
object Sketches {

  /** Count-Min Sketch over string keys. Estimate error ≤ ε·N with
    * ε ≈ e/width at confidence 1 − e^(−depth). Deterministic hashes →
    * reproducible estimates. */
  class CountMinSketch(depth: Int, width: Int)
      extends Aggregator[String, Array[Long], Array[Long]] {

    override def zero: Array[Long] = new Array[Long](depth * width)

    override def reduce(b: Array[Long], key: String): Array[Long] = {
      var d = 0
      while (d < depth) {
        b(d * width + CountMinSketch.bucket(key, d, width)) += 1L
        d += 1
      }
      b
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object CountMinSketch {
    def bucket(key: String, seed: Int, width: Int): Int = {
      val h = MurmurHash3.stringHash(key, seed * 0x9E3779B9 + 1)
      java.lang.Math.floorMod(h, width)
    }

    /** Point estimate: min over the depth rows. */
    def estimate(sketch: Array[Long], key: String, depth: Int,
                 width: Int): Long = {
      var best = Long.MaxValue
      var d = 0
      while (d < depth) {
        val v = sketch(d * width + bucket(key, d, width))
        if (v < best) best = v
        d += 1
      }
      best
    }
  }

  /** Column form: `cms(depth, width)(keyCol)` usable in agg(). */
  def cms(depth: Int, width: Int): Column => Column =
    key => udaf(new CountMinSketch(depth, width)).apply(key)
}
