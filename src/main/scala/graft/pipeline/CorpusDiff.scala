package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus version diff — the dataset-versioning primitive: given two
  * snapshots of a corpus, classify every document as added / removed /
  * changed / unchanged and summarize per class. This is how a curation
  * pipeline audits what a re-crawl, a re-filter, or an upstream fix
  * actually did before the new version ships to training.
  *
  * Shape: one full-outer equi-join on the id (shuffle on an 8-byte
  * key) + a reduced 4-row aggregate. Content equality here compares
  * the text columns directly so the SQL oracle can replay it; at
  * 100 TB both sides would project `xxhash64(text)` before the join —
  * 8-byte payloads instead of documents, same classification modulo
  * hash collisions.
  */
object CorpusDiff {

  /** @return (status ∈ added|removed|changed|unchanged, n_docs,
    *          min_id, max_id) ordered by status */
  def diff(a: DataFrame, b: DataFrame, idCol: String,
           textCol: String): DataFrame = {
    val l = a.select(col(idCol).as("id"), col(textCol).as("_ta"))
    val r = b.select(col(idCol).as("id"), col(textCol).as("_tb"))
    val joined = l.join(r, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("_tb").isNull, "removed")
          .when(col("_ta").isNull, "added")
          .when(col("_ta") === col("_tb"), "unchanged")
          .otherwise("changed"))
    joined.groupBy(col("status"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
      // ≤4 rows by construction (the status domain): single-task total
      // order instead of orderBy's range-partition sampling job (the
      // round-17 sorted1 rule — a structural bound, so both profiles)
      .repartition(1).sortWithinPartitions("status")
  }
}
