package graft

import graft.operators.PromBinOp

class PromBinOpSpec extends SparkSpec {
  import spark.implicits._

  private lazy val a = Seq(("api", "p1", 10.0), ("api", "p2", 20.0),
    ("web", "p1", 30.0)).toDF("job", "pod", "value")
  private lazy val b = Seq(("api", "p1", 2.0), ("api", "p2", 4.0),
    ("db", "p1", 5.0)).toDF("job", "pod", "value")
  private val labels = Seq("job", "pod")

  test("arithmetic matches one-to-one on all labels; unmatched drop") {
    val out = PromBinOp.arith(a, b, "/", labels)
      .as[(String, String, Double)].collect().toSet
    assert(out == Set(("api", "p1", 5.0), ("api", "p2", 5.0)))
  }

  test("ignoring() widens the match") {
    // ignore pod: b collapsed to job level must be 1 row per job
    val bJob = b.groupBy($"job").agg(org.apache.spark.sql.functions
      .sum($"value").as("value"))
    val out = PromBinOp.arith(a, bJob, "-", labels, ignoring = Seq("pod"))
      .as[(String, Double)].collect().toSet
    assert(out == Set(("api", 4.0), ("api", 14.0))) // 10-6, 20-6
  }

  test("comparison filters keeping left values") {
    val out = PromBinOp.comparison(a, b, ">", labels)
      .select("job", "pod", "value").as[(String, String, Double)]
      .collect().toSet
    assert(out == Set(("api", "p1", 10.0), ("api", "p2", 20.0)))
    val none = PromBinOp.comparison(a, b, "<", labels)
    assert(none.count() == 0)
  }

  test("and / unless / or set semantics") {
    val and = PromBinOp.and(a, b, labels)
      .select("job", "pod").as[(String, String)].collect().toSet
    assert(and == Set(("api", "p1"), ("api", "p2")))
    val unless = PromBinOp.unless(a, b, labels)
      .select("job", "pod").as[(String, String)].collect().toSet
    assert(unless == Set(("web", "p1")))
    val or = PromBinOp.or(a, b, labels)
      .select("job", "pod", "value").as[(String, String, Double)]
      .collect().toSet
    assert(or == Set(("api", "p1", 10.0), ("api", "p2", 20.0),
      ("web", "p1", 30.0), ("db", "p1", 5.0)))
  }
}
