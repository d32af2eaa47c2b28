package graft.util

import org.apache.spark.sql.DataFrame

/** Report-boundary helpers shared by the declared queries. */
object Report {

  /** `orderBy` with the range-sampler double-execution guard (r18).
    *
    * A global sort's range partitioner SAMPLES its child to pick split
    * points, and sampling iterates EVERY child row — so when the sort
    * sits directly on a narrow chain (scan → projection), the whole
    * projection executes twice per run. Measured at sf3 on
    * q_text_tokens_regex: two identical ~40 s-CPU stages for one
    * 40 s projection. A LAZY localCheckpoint persists the projected
    * rows the first time the sampler iterates them, and the sort pass
    * reads the blocks — one projection per run, each run still paying
    * its own honest cost (no cross-run caching; this is the
    * winnowPairs r13 materialization pattern, factored out).
    *
    * Use ONLY under a sort whose child has no shuffle of its own —
    * below an aggregation/join exchange the sampler re-reads shuffle
    * files, which is already cheap, and the checkpoint would just add
    * block traffic.
    *
    * Cluster deployment caveat (ADVICE r18): localCheckpoint truncates
    * lineage into UNREPLICATED executor-local blocks — on a real
    * cluster an executor loss between the sampling pass and the sort
    * fails the query instead of recomputing, and the blocks pin
    * MEMORY_AND_DISK storage until the RDD is GC'd. That is the right
    * trade for a single-process bench harness; a fault-tolerant
    * deployment should either accept the plain double-executing
    * `orderBy` or persist the pre-sort frame with replication
    * (StorageLevel.MEMORY_AND_DISK_2) / a reliable checkpoint dir
    * instead. */
  implicit class SortedOnce(private val df: DataFrame) extends AnyVal {
    def sortedOnce(cols: String*): DataFrame = {
      val c = df.localCheckpoint(false)
      c.orderBy(cols.map(c.col): _*)
    }
  }
}
