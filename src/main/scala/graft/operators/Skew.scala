package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hash-partitioned shapes.
  *
  * Spark already covers most skew: hash aggregation combines map-side
  * (a hot group key sends one partial per map task, not its raw rows),
  * and AQE splits skewed sort-merge-join partitions at runtime. What is
  * left exposed at 100 TB:
  *  - shuffle joins where one key dominates and the plan is not an AQE
  *    skew-join candidate (e.g. the salted side feeds further keyed
  *    stages and must keep its distribution);
  *  - per-key window processing — handled by the chunked substrate
  *    ([[SeriesOps.chunkedLag]]), which salts BY TIME so order survives.
  *
  * [[saltedJoin]] is the classic replicate-and-salt construction: the
  * small/build side is replicated `salts`× with an explicit salt column,
  * the large/probe side tags each row with a deterministic salt derived
  * from a per-row column (a unique id keeps it uniform regardless of the
  * key distribution), and the join runs on (keys, salt) — a hot key's
  * rows spread over `salts` reducers instead of hammering one. Result is
  * row-identical to the plain join; the salt never leaves the operator.
  */
object Skew {

  /** Inner/left equi-join on `keys` with the probe side salted.
    *
    * @param probe    the large, possibly skewed side (each row joins as-is)
    * @param build    the side that is replicated `salts`× (must be the
    *                 smaller side — its shuffled volume multiplies)
    * @param keys     equi-join key columns present on both sides
    * @param saltFrom probe-side column with per-row entropy (unique id);
    *                 the salt is `xxhash64(saltFrom) mod salts`, so the
    *                 spread is uniform even when `keys` are constant
    * @param salts    number of salt buckets a hot key fans out over
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 saltFrom: Column, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, not $joinType " +
        "(right/full would need the build side salted too)")
    val p = probe.withColumn("_salt",
      pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
    val b = build.withColumn("_salt",
      explode(array((0 until salts).map(i => lit(i)): _*)))
    p.join(b, keys :+ "_salt", joinType).drop("_salt")
  }
}
