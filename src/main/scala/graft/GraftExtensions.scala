package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.{NearestCentroid, PqAdc, VectorDot}

/** Cluster-deployment entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` injects the engine's
  * native Catalyst expressions into EVERY session the cluster builds —
  * no graft API call needed before `spark.sql("SELECT vec_dot(a, b) …")`.
  *
  * Injected here: the codegen'd vector kernels (`vec_dot`,
  * `vec_nearest_centroid`, `pq_adc`) and the bounded-heap top-k
  * aggregate (`topk_rows`). The UDF-backed scalar surface (IP functions
  * etc.) cannot be expression-injected — [[Graft.init]] is the one-call
  * session setup that registers everything, and the operator entry
  * points keep their lazy idempotent self-registration so direct library
  * use needs neither.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two float/double arrays"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_nearest_centroid"),
      info("vec_nearest_centroid",
        "vec_nearest_centroid(v, codebook) - index of nearest centroid by squared L2"),
      (exprs: Seq[Expression]) => NearestCentroid(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("pq_adc"),
      info("pq_adc",
        "pq_adc(codes, tables) - asymmetric-distance PQ lookup fold"),
      (exprs: Seq[Expression]) => PqAdc(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("topk_rows"),
      info("topk_rows",
        "topk_rows(struct, k, sortArity, descMask) - bounded-heap top-k rows"),
      (exprs: Seq[Expression]) =>
        graft.expressions.TopKRows.build(exprs)))
    // band-join theta conditions (`abs(l.t - r.t) <= c`, the two-sided
    // BETWEEN spelling, inner and left/right outer) rewrite to the
    // bucketized equi-join automatically — the naive user spelling gets
    // the scale-correct plan (BandJoinRewrite scaladoc)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
  }
}

/** One-call session setup for direct library use: registers every
  * SQL-reachable function the engine defines (native expressions + the
  * UDF-backed scalar registry). Idempotent; operator entry points also
  * self-register lazily, so calling this is a convenience, not a
  * requirement. */
object Graft {
  def init(spark: SparkSession): Unit = {
    graft.expressions.VectorExpressions.register(spark)
    graft.expressions.TopKRows.register(spark)
    graft.expressions.ModeExact.register(spark)
    graft.functions.GeminiFunctions.registerSql(spark)
  }
}
