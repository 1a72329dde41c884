package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Root-cause fault demarcation — the reference's `rca` table function
  * (`engine/executor/rca.go:160` FaultDemarcation): given anomaly/alarm
  * events per entity and a service topology, start from a core entity's
  * anomaly timestamps and carve out the subgraph the fault plausibly
  * propagated through.
  *
  * Demarcation contract re-expressed Spark-first (not a chunk-for-chunk
  * port of the nested BFS):
  *
  *  - an entity is CORRELATED when it has an event whose timestamp lies
  *    within the type's window of SOME core anomaly timestamp —
  *    ±30 min for `anomaly` timestamps and alarm end-times, ±2 h for
  *    alarm/event start and creation times (`rca.go:83` isAnomaly);
  *  - correlated entities reachable from the core through chains of
  *    correlated entities each at most `hopCount` hops apart EXPAND the
  *    search (`rca.go` outer queue: only anomalous nodes explore);
  *  - non-correlated entities within `hopCount` hops of an expanded
  *    entity are included as fringe but never expand;
  *  - the result is the induced subgraph over included entities — the
  *    same edge set the reference accumulates (edges whose far endpoint
  *    is already visited).
  *
  * Core timestamps are collected driver-side (one entity's anomaly
  * list — the reference does the same in extractCoreAnomalyTimestamps);
  * correlation is a distributed map-side test against that broadcast
  * list; each expansion hop is one distributed neighbor join, frontier
  * driver-side like [[Graph]]'s driver tier.
  */
object Rca {

  /** Correlation window per event type (`rca.go:85-88`). */
  private def windowMs(eventType: Column): Column =
    when(eventType === "anomaly" || eventType === "alarm_end",
      lit(30L * 60 * 1000)).otherwise(lit(120L * 60 * 1000))

  /** Lower the reference's annotations shape — rows of (entity_id,
    * type, annotations JSON) per `rca.go:36-51` — to the flat
    * (entity_id, event_type, event_ms) frame [[faultDemarcation]]
    * consumes. Anomalies explode their `timestamps` array; alarms with
    * an `end_time` get the tight window (type `alarm_end`), otherwise
    * `start_time`/`create_time` get the loose one. */
  def eventsFromAnnotations(df: DataFrame): DataFrame = {
    val ann = col("annotations")
    val anomalies = df.filter(col("type") === "anomaly")
      .select(col("entity_id"), lit("anomaly").as("event_type"),
        explode(from_json(get_json_object(ann, "$.timestamps"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType))).as("event_ms"))
    val alarmEnd = df.filter(col("type") =!= "anomaly" &&
        get_json_object(ann, "$.end_time").isNotNull)
      .select(col("entity_id"), lit("alarm_end").as("event_type"),
        get_json_object(ann, "$.end_time").cast("long").as("event_ms"))
    val loose = df.filter(col("type") =!= "anomaly" &&
        get_json_object(ann, "$.end_time").isNull)
      .select(col("entity_id"), col("type").as("event_type"),
        coalesce(get_json_object(ann, "$.start_time").cast("long"),
          get_json_object(ann, "$.create_time").cast("long"))
          .as("event_ms"))
      .filter(col("event_ms").isNotNull)
    anomalies.unionByName(alarmEnd).unionByName(loose)
  }

  /** Fault demarcation from `core`. `events`: (entity_id, event_type,
    * event_ms); `edges`: (src, dst) — pass the symmetrized frame for an
    * undirected topology. Returns (nodes, edges): nodes carry
    * (entity_id, correlated, expanded); edges is the induced subgraph.
    * `maxRounds` bounds the outer expansion (each round must discover a
    * new correlated entity to continue, so it is a safety rail, not a
    * tuning knob). */
  def faultDemarcation(events: DataFrame, edges: DataFrame, core: String,
                       hopCount: Int = 2,
                       maxRounds: Int = 16): (DataFrame, DataFrame) = {
    require(hopCount >= 1 && hopCount <= 8, s"hopCount out of range")
    val spark = events.sparkSession
    import spark.implicits._

    // the core's anomaly timestamps (driver-side, one entity's list)
    val coreTs = events
      .filter(col("entity_id") === core && col("event_type") === "anomaly")
      .select(col("event_ms")).distinct().as[Long].collect().sorted
    require(coreTs.nonEmpty, s"no anomaly timestamps for core entity $core")

    // distributed correlation test: any event within its window of any
    // core timestamp (the timestamp list rides the plan as one literal)
    val tsArr = array(coreTs.map(lit(_)).toIndexedSeq: _*)
    val correlatedDf = events
      .filter(exists(tsArr,
        t => abs(col("event_ms") - t) <= windowMs(col("event_type"))))
      .select(col("entity_id")).distinct()
    val correlated = correlatedDf.as[String].collect().toSet

    val e = edges.select(col("src").cast("string"), col("dst").cast("string"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def neighborsWithin(seed: Set[String]): Set[String] = {
      var reach = seed
      var frontier = seed
      var h = 0
      while (h < hopCount && frontier.nonEmpty) {
        h += 1
        val fr = frontier.toSeq
        val next =
          (if (fr.size <= 1024) e.filter(col("src").isin(fr: _*))
           else e.join(broadcast(fr.toDF("src")), "src"))
            .select(col("dst")).distinct().as[String].collect().toSet
        frontier = next -- reach
        reach ++= next
      }
      reach
    }

    // outer expansion: correlated entities discovered within hopCount
    // of the expanded set join it; everything reached is included
    var expanded = Set(core)
    var included = Set(core)
    var grew = true
    var rounds = 0
    while (grew && rounds < maxRounds) {
      rounds += 1
      val reach = neighborsWithin(expanded)
      included ++= reach
      val newly = (reach & correlated) -- expanded
      grew = newly.nonEmpty
      expanded ++= newly
    }
    e.unpersist(blocking = false)

    val nodes = included.toSeq.sorted
      .map(id => (id, correlated.contains(id) || id == core,
        expanded.contains(id)))
      .toDF("entity_id", "correlated", "expanded")
    val inc = included.toSeq
    val inducedEdges = edges
      .filter(col("src").isin(inc: _*) && col("dst").isin(inc: _*))
    (nodes, inducedEdges)
  }
}
