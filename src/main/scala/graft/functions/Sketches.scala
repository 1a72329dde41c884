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

  /** One ranked heavy-hitter row out of [[CmsTopN]]. */
  case class TopNHit(rnk: Int, key: String, est: Long)

  /** Mutable buffer: CMS counters + bounded candidate→estimate map.
    * Kryo-encoded, so it only serializes at partition boundaries — the
    * per-row `reduce` mutates in place (an immutable-Map + sort-per-row
    * version of this was measured 50× slower on the sf0.1 bench). */
  class CmsTopNBuf(val cms: Array[Long],
                   val cand: java.util.HashMap[String, Long])
    extends Serializable

  /** Top-n heavy hitters with in-aggregator candidate tracking — the
    * reference's topn_ddcm shape (`engine/executor/topn_transform.go:133`:
    * sketch + candidate heap carried together through the merge tree).
    *
    * Why this and not "estimate every distinct key against the sketch":
    * at 100 TB the distinct-key set is the thing you cannot materialize —
    * enumerating it defeats the sketch. Here the shuffle carries one
    * (depth×width CMS + ≤2·maxCand candidate entries) buffer per
    * partition, independent of input size. Eviction is amortized
    * SpaceSaving-style: the map grows to 2·maxCand, then one sort trims
    * it to the top maxCand by estimate — O(log maxCand) amortized per
    * row. `merge` re-estimates the candidate union against the merged CMS
    * (CMS merge = counter sum, order-independent), so when maxCand covers
    * the per-partition candidate flow the final estimates equal
    * single-pass estimates — and when it doesn't, the eviction keeps
    * error bounded by the CMS ε·N. `finish` ranks in-buffer: no
    * distinct(), no partitionless Window, no per-row UDF downstream —
    * callers just explode the result. */
  class CmsTopN(depth: Int, width: Int, maxCand: Int, n: Int)
      extends Aggregator[String, CmsTopNBuf, Seq[TopNHit]] {

    private def evictTo(b: CmsTopNBuf, keep: Int): Unit =
      if (b.cand.size > keep) {
        val entries = new Array[(String, Long)](b.cand.size)
        val it = b.cand.entrySet().iterator()
        var i = 0
        while (it.hasNext) {
          val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
        }
        b.cand.clear()
        entries.sortBy { case (k, est) => (-est, k) }.take(keep)
          .foreach { case (k, est) => b.cand.put(k, est) }
      }

    override def zero: CmsTopNBuf =
      new CmsTopNBuf(new Array[Long](depth * width),
        new java.util.HashMap[String, Long]())

    override def reduce(b: CmsTopNBuf, key: String): CmsTopNBuf = {
      var d = 0
      while (d < depth) {
        b.cms(d * width + CountMinSketch.bucket(key, d, width)) += 1L
        d += 1
      }
      b.cand.put(key, CountMinSketch.estimate(b.cms, key, depth, width))
      if (b.cand.size > 2 * maxCand) evictTo(b, maxCand)
      b
    }

    override def merge(a: CmsTopNBuf, b: CmsTopNBuf): CmsTopNBuf = {
      var i = 0
      while (i < a.cms.length) { a.cms(i) += b.cms(i); i += 1 }
      // re-estimate the union against the merged (order-independent) CMS
      val bIt = b.cand.keySet().iterator()
      while (bIt.hasNext) a.cand.put(bIt.next(), 0L)
      val aIt = a.cand.entrySet().iterator()
      while (aIt.hasNext) {
        val e = aIt.next()
        e.setValue(CountMinSketch.estimate(a.cms, e.getKey, depth, width))
      }
      evictTo(a, maxCand)
      a
    }

    override def finish(b: CmsTopNBuf): Seq[TopNHit] = {
      val entries = new Array[(String, Long)](b.cand.size)
      val it = b.cand.entrySet().iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
      }
      entries.sortBy { case (k, est) => (-est, k) }.take(n)
        .zipWithIndex.map { case ((k, e), j) => TopNHit(j + 1, k, e) }.toSeq
    }

    override def bufferEncoder: Encoder[CmsTopNBuf] = Encoders.kryo[CmsTopNBuf]
    override def outputEncoder: Encoder[Seq[TopNHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopNHit]]()
  }

  /** Column form: `cmsTopN(depth, width, maxCand, n)(keyCol)`. */
  def cmsTopN(depth: Int, width: Int, maxCand: Int, n: Int): Column => Column =
    key => udaf(new CmsTopN(depth, width, maxCand, n)).apply(key)
}
