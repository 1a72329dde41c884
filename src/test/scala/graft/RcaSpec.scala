package graft

import graft.operators.Rca

/** Fault demarcation (`engine/executor/rca.go` FaultDemarcation
  * contract): correlated entities expand the search, fringe entities
  * are included but inert, windows differ by event type. */
class RcaSpec extends SparkSpec {
  import spark.implicits._

  private val T = 1700000000000L // core anomaly epoch ms

  // chain topology: c1 - c2 - c3 - c4 - c5 (symmetrized)
  private lazy val edges = {
    val fwd = Seq(("c1", "c2"), ("c2", "c3"), ("c3", "c4"), ("c4", "c5"))
    (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
  }

  test("correlated entities expand; fringe is included but inert") {
    val events = Seq(
      ("c1", "anomaly", T),                       // the core anomaly
      ("c2", "anomaly", T + 10 * 60 * 1000L),     // within ±30min
      ("c3", "anomaly", T + 10 * 3600 * 1000L),   // 10h away: NOT correlated
      ("c4", "anomaly", T - 20 * 60 * 1000L))     // correlated but far away
      .toDF("entity_id", "event_type", "event_ms")
    // hop 1: c2 correlates and expands; c3 is its fringe; c4 sits two
    // hops beyond the last correlated entity → excluded
    val (n1, e1) = Rca.faultDemarcation(events, edges, "c1", hopCount = 1)
    val nodes1 = n1.as[(String, Boolean, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(nodes1.keySet == Set("c1", "c2", "c3"))
    assert(nodes1("c2") == ((true, true)))   // correlated + expanded
    assert(nodes1("c3") == ((false, false))) // fringe only
    assert(e1.as[(String, String)].collect().toSet ==
      Set(("c1", "c2"), ("c2", "c1"), ("c2", "c3"), ("c3", "c2")))
    // hop 2: c4 is within 2 hops of expanded c2 → correlated → expands,
    // dragging c5 in as fringe
    val (n2, _) = Rca.faultDemarcation(events, edges, "c1", hopCount = 2)
    val nodes2 = n2.as[(String, Boolean, Boolean)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(nodes2.keySet == Set("c1", "c2", "c3", "c4", "c5"))
    assert(nodes2("c4") == ((true, true)))
    assert(nodes2("c5") == ((false, false)))
  }

  test("windows differ by type: alarm_end tight, alarm/event loose") {
    val events = Seq(
      ("c1", "anomaly", T),
      ("c2", "alarm_end", T + 40 * 60 * 1000L),  // 40min > 30min: out
      ("c3", "anomaly", T + 10 * 60 * 1000L),    // bridge toward c4
      ("c4", "alarm", T + 90 * 60 * 1000L))      // 90min < 2h: correlated
      .toDF("entity_id", "event_type", "event_ms")
    val (n, _) = Rca.faultDemarcation(events, edges, "c1", hopCount = 2)
    val nodes = n.as[(String, Boolean, Boolean)].collect()
      .map(t => t._1 -> t._2).toMap
    // c2's tight alarm_end window misses; c3 correlates (anomaly 10min);
    // c4's loose alarm window hits and is within 2 hops of expanded c3
    assert(nodes.get("c2").contains(false))
    assert(nodes.get("c3").contains(true))
    assert(nodes.get("c4").contains(true))
  }

  test("annotations JSON lowers to the flat event frame") {
    val raw = Seq(
      ("c1", "anomaly", s"""{"timestamps":[$T,${T + 1000}]}"""),
      ("c2", "alarm", s"""{"start_time":${T + 1}, "end_time":${T + 2}}"""),
      ("c3", "alarm", s"""{"start_time":${T + 3}}"""),
      ("c4", "event", s"""{"create_time":${T + 4}}"""))
      .toDF("entity_id", "type", "annotations")
    val flat = Rca.eventsFromAnnotations(raw)
      .as[(String, String, Long)].collect().toSet
    assert(flat == Set(
      ("c1", "anomaly", T), ("c1", "anomaly", T + 1000),
      ("c2", "alarm_end", T + 2),
      ("c3", "alarm", T + 3),
      ("c4", "event", T + 4)))
  }

  test("induced-edge plan is semi-joins, not isin literals over included") {
    val events = Seq(
      ("c1", "anomaly", T),
      ("c2", "anomaly", T + 10 * 60 * 1000L))
      .toDF("entity_id", "event_type", "event_ms")
    // maxDriverFrontier=1 forces past the resident tier (whose local
    // result frame legitimately has no joins) onto the distributed
    // path, whose membership must ride joins
    val (_, e1) = Rca.faultDemarcation(events, edges, "c1", hopCount = 2,
      maxDriverFrontier = 1)
    val plan = e1.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan)
    // membership must ride a join, never an In/InSet literal list
    assert(!plan.contains("INSET") && !plan.contains(" IN ("), plan)
  }

  test("distributed fallback tier matches the driver tier") {
    val events = Seq(
      ("c1", "anomaly", T),
      ("c2", "anomaly", T + 10 * 60 * 1000L),
      ("c3", "anomaly", T + 10 * 3600 * 1000L),
      ("c4", "anomaly", T - 20 * 60 * 1000L))
      .toDF("entity_id", "event_type", "event_ms")
    for (hop <- Seq(1, 2)) {
      val (nd, ed) = Rca.faultDemarcation(events, edges, "c1", hopCount = hop)
      // maxDriverFrontier=1 overflows on the first hop → distributed tier
      val (nx, ex) = Rca.faultDemarcation(events, edges, "c1", hopCount = hop,
        maxDriverFrontier = 1)
      assert(nx.as[(String, Boolean, Boolean)].collect().toSet ==
        nd.as[(String, Boolean, Boolean)].collect().toSet, s"hop=$hop nodes")
      assert(ex.as[(String, String)].collect().toSet ==
        ed.as[(String, String)].collect().toSet, s"hop=$hop edges")
    }
  }

  test("a core with no anomaly timestamps fails loudly") {
    val events = Seq(("c2", "anomaly", T))
      .toDF("entity_id", "event_type", "event_ms")
    val e = intercept[RuntimeException] {
      Rca.faultDemarcation(events, edges, "c1")
    }
    assert(e.getMessage.contains("no anomaly timestamps"))
  }
}
