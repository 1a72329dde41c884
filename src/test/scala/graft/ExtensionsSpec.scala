package graft

import org.apache.spark.sql.SparkSession

/** `spark.sql.extensions=graft.GraftExtensions` deployment path: a session
  * built with the extensions reaches every native function from plain SQL
  * with no graft API call. */
class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions injects vec_dot/vec_nearest_centroid/pq_adc/" +
      "topk_rows into a fresh session's SQL surface") {
    val prior = spark // keep the shared session's context alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // withExtensions, not .config("spark.sql.extensions", …):
    // spark.sql.extensions is a STATIC conf read from the SparkContext,
    // so it cannot apply to a session built over the suite's existing
    // context — the conf route only works on a fresh JVM/cluster (its
    // intended deployment). The injection object under test is the same.
    val ext =
      try SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      finally {
        SparkSession.setActiveSession(prior)
        SparkSession.setDefaultSession(prior)
      }
    try {
      val dot = ext.sql(
        "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D))")
        .head().getDouble(0)
      assert(dot == 32.0)
      val cell = ext.sql(
        "SELECT vec_nearest_centroid(array(0.9D, 0.1D), " +
          "array(array(1.0D, 0.0D), array(0.0D, 1.0D)))")
        .head().getInt(0)
      assert(cell == 0)
      val adc = ext.sql(
        "SELECT pq_adc(array(1, 0), array(array(1.0D, 2.0D), " +
          "array(10.0D, 20.0D)))")
        .head().getDouble(0)
      assert(adc == 12.0)
      val top = ext.sql(
        "SELECT topk_rows(struct(x, x, named_struct('x', x)), 2, 2, 'DD') " +
          "FROM VALUES (1), (3), (2) AS t(x)")
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(top.map(_.getInt(0)) == Seq(3, 2))
    } finally {
      SparkSession.setActiveSession(prior)
      SparkSession.setDefaultSession(prior)
    }
  }

  test("BandJoinRewrite: the naive abs-diff theta join becomes a " +
      "bucketized equi-join with identical results") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val l = Seq((1L, "u1", 10000L), (2L, "u1", 50000L), (3L, "u2", 10000L),
        (4L, "u1", 19999L))
      .toDF("lid", "k", "lt")
    val r = Seq((101L, "u1", 8000L), (102L, "u1", 20000L),
        (103L, "u1", 31000L), (104L, "u2", 10000L), (105L, "u3", 10000L))
      .toDF("rid", "k2", "rt")
    def theta = l.join(r,
      l("k") === r("k2") && abs(l("lt") - r("rt")) <= lit(10000L))
    val naive = theta.select($"lid", $"rid").orderBy("lid", "rid")
      .as[(Long, Long)].collect().toSeq
    val naivePlan = theta.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct") ||
      // equi-key present → Spark joins on k and post-filters; either
      // way the band is not a join key without the rule
      !naivePlan.contains("_graft_bkt"), naivePlan)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    try {
      val rewritten = theta.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      assert(rewritten == naive, s"$rewritten vs $naive")
      val plan = theta.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bkt"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      // keyless band join (pure time window) also rewrites
      def keyless = l.join(r, abs(l("lt") - r("rt")) <= lit(5000L))
      val kl = keyless.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      assert(kl.contains((1L, 101L)) && kl.contains((4L, 102L)), kl)
      assert(keyless.queryExecution.executedPlan.toString
        .contains("_graft_bkt"))
      // nanosecond-epoch longs above 2^53: the integral bucket path
      // must not quantize (a double round-trip loses ~256 ns there and
      // silently drops true matches — the review-found precision trap)
      val base = 1700000000000000000L
      val ln = Seq((1L, base), (2L, base + 150L)).toDF("lid", "lt")
      val rn = Seq((201L, base + 60L), (202L, base + 90000L))
        .toDF("rid", "rt")
      def nsj = ln.join(rn, abs(ln("lt") - rn("rt")) <= lit(100L))
      val got = nsj.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 201L), (2L, 201L)), got.toString)
      assert(nsj.queryExecution.executedPlan.toString
        .contains("_graft_bkt"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.BandJoinRewrite)
    }
  }

  test("BandJoinRewrite: a user-written NARROWING cast is not stripped — " +
      "cast(abs(x-y) as int) <= c keeps the naive plan and its wrap match") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    val priorAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      // |lt - rt| = 2^32 exactly: the long diff wraps to int 0, so the
      // user's cast-to-int predicate MATCHES under non-ANSI mode. A
      // stripped raw-operand bucket join would place the rows 2^32
      // apart and silently drop the match — the rule must leave a
      // non-double cast target unrewritten.
      val ln = Seq((1L, 4294967296L)).toDF("lid", "lt")
      val rn = Seq((201L, 0L)).toDF("rid", "rt")
      def wrap = ln.join(rn,
        abs(ln("lt") - rn("rt")).cast("int") <= lit(5))
      val plan = wrap.queryExecution.executedPlan.toString
      assert(!plan.contains("_graft_bkt"), plan)
      val got = wrap.select($"lid", $"rid").as[(Long, Long)].collect().toSeq
      assert(got == Seq((1L, 201L)), got.toString)
      // the double cast Catalyst inserts (fractional bound) still strips
      def fine = ln.join(rn, abs(ln("lt") - rn("rt")) <= lit(0.5))
      assert(fine.queryExecution.executedPlan.toString
        .contains("_graft_bkt"))
    } finally {
      spark.conf.set("spark.sql.ansi.enabled", priorAnsi)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.BandJoinRewrite)
    }
  }

  test("BandJoinRewrite: fractional band widths — integral operands " +
      "keep the exact long path (ceil width); both-double sides get m=3") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    try {
      // abs spelling, fractional width, ns-epoch longs: coercion wraps
      // the long diff in cast-to-double; the rule strips it and buckets
      // the RAW longs on ceil(100.5) — a double floor(x/100.5) at this
      // magnitude quantizes by ~256 ns and can drop the true match
      val base = 1700000000000000000L
      val ln = Seq((1L, base), (2L, base + 150L)).toDF("lid", "lt")
      val rn = Seq((401L, base + 100L), (402L, base + 90000L))
        .toDF("rid", "rt")
      def fw = ln.join(rn, abs(ln("lt") - rn("rt")) <= lit(100.5))
      assert(fw.queryExecution.executedPlan.toString
        .contains("_graft_bkt"), fw.queryExecution.executedPlan.toString)
      val fwGot = fw.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      assert(fwGot == Seq((1L, 401L), (2L, 401L)), fwGot.toString)
      // two-sided fractional over longs: each side coerces to double
      // INDEPENDENTLY (no shared long diff), so both bucket via f64 —
      // the m=3 margin must reproduce the naive f64 predicate exactly
      def ts = ln.join(rn,
        ln("lt") >= rn("rt") - lit(100.5) && ln("lt") <= rn("rt") + lit(100.5))
      assert(ts.queryExecution.executedPlan.toString.contains("_graft_bkt"))
      val tsGot = ts.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.BandJoinRewrite)
      val tsNaive = ts.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
      assert(tsGot == tsNaive && tsGot.nonEmpty, s"$tsGot vs $tsNaive")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.BandJoinRewrite)
    }
  }

  test("BandJoinRewrite: two-sided/BETWEEN spelling and LEFT OUTER " +
      "band joins rewrite and match the naive plan") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val l = Seq((1L, "u1", 10000L), (2L, "u1", 50000L), (3L, "u2", 10000L),
        (4L, "u1", 19999L), (5L, "u9", 999999L))
      .toDF("lid", "k", "lt")
    val r = Seq((101L, "u1", 8000L), (102L, "u1", 20000L),
        (103L, "u1", 31000L), (104L, "u2", 10000L), (105L, "u3", 10000L))
      .toDF("rid", "k2", "rt")
    def res(df: org.apache.spark.sql.DataFrame) =
      df.select($"lid", $"rid").orderBy("lid", "rid")
        .collect().map(x => (x.get(0), x.get(1))).toSeq
    // what the user writes after expanding abs(): l.lt BETWEEN rt±c
    def twoSided = l.join(r,
      l("k") === r("k2") && l("lt") >= r("rt") - 10000L &&
        l("lt") <= r("rt") + 10000L)
    def absForm = l.join(r,
      l("k") === r("k2") && abs(l("lt") - r("rt")) <= lit(10000L))
    val naive = res(twoSided)
    assert(naive == res(absForm))
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    try {
      assert(res(twoSided) == naive, s"${res(twoSided)} vs $naive")
      val plan = twoSided.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bkt"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      // asymmetric band (lt ∈ [rt−3000, rt+12000]) still exact
      def asym = l.join(r,
        l("k") === r("k2") && l("lt") >= r("rt") - 3000L &&
          l("lt") <= r("rt") + 12000L)
      assert(asym.queryExecution.executedPlan.toString
        .contains("_graft_bkt"))
      val asymGot = res(asym)
      val asymWant = Seq((1L, 101L), (1L, 104L), (3L, 104L), (4L, 101L),
        (4L, 102L)).filter { case (a, b) =>
          // recompute from the inputs: k match && band
          val lm = Map(1L -> ("u1", 10000L), 2L -> ("u1", 50000L),
            3L -> ("u2", 10000L), 4L -> ("u1", 19999L))
          val rm = Map(101L -> ("u1", 8000L), 102L -> ("u1", 20000L),
            103L -> ("u1", 31000L), 104L -> ("u2", 10000L),
            105L -> ("u3", 10000L))
          lm(a)._1 == rm(b)._1 && lm(a)._2 >= rm(b)._2 - 3000L &&
            lm(a)._2 <= rm(b)._2 + 12000L
        }
      assert(asymGot == asymWant, s"$asymGot vs $asymWant")
      // SQL BETWEEN parses to the same pair and rewrites too
      l.createOrReplaceTempView("bl"); r.createOrReplaceTempView("br")
      val sql = spark.sql(
        "SELECT lid, rid FROM bl JOIN br ON k = k2 AND " +
          "lt BETWEEN rt - 10000 AND rt + 10000")
      assert(sql.queryExecution.executedPlan.toString
        .contains("_graft_bkt"))
      assert(res(sql) == naive)
      // LEFT OUTER: unmatched left rows survive exactly once with a
      // null payload; matched rows identical to inner
      def lo = l.join(r,
        l("k") === r("k2") && abs(l("lt") - r("rt")) <= lit(10000L),
        "left_outer")
      val loPlan = lo.queryExecution.executedPlan.toString
      assert(loPlan.contains("_graft_bkt"), loPlan)
      assert(!loPlan.contains("BroadcastNestedLoopJoin"), loPlan)
      val loGot = lo.select($"lid", $"rid").orderBy("lid", "rid")
        .collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L
          else x.getLong(1))).toSeq
      val inner = naive.map { case (a, b) =>
        (a.asInstanceOf[Long], b.asInstanceOf[Long]) }
      val unmatched = Seq(1L, 2L, 3L, 4L, 5L)
        .filterNot(a => inner.exists(_._1 == a)).map((_, -1L))
      assert(loGot == (inner ++ unmatched).sorted, loGot.toString)
      // double-path boundary: floating operands at an exact bucket
      // edge (x/c = 3.0 boundary) must not drop the true match — the
      // ±2 probe margin covers f64 floor jitter
      val lf = Seq((1L, 0.3), (2L, 1.0), (3L, 7.35)).toDF("lid", "lt")
      val rf = Seq((301L, 0.3), (302L, 0.95), (303L, 7.30))
        .toDF("rid", "rt")
      def fj = lf.join(rf, abs(lf("lt") - rf("rt")) <= lit(0.1))
      assert(fj.queryExecution.executedPlan.toString
        .contains("_graft_bkt"))
      val fGot = fj.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.BandJoinRewrite)
      val fNaive = fj.select($"lid", $"rid").orderBy("lid", "rid")
        .as[(Long, Long)].collect().toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
      assert(fGot == fNaive && fGot.nonEmpty, s"$fGot vs $fNaive")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.BandJoinRewrite)
    }
  }
}
