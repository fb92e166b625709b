package graft.operators

import org.apache.spark.sql.DataFrame

/** Lifecycle tracker for caches that operators create INTERNALLY —
  * the LSH shingle projection ([[Dedup.minhashLshPairs]]), the curated
  * `exact` prefix ([[CurationPipeline.curate]]), and the final
  * connected-components label checkpoint ([[Dedup.connectedComponents]]).
  *
  * Why it exists: those operators return lazy DataFrames, so they
  * cannot unpersist their own caches — the blocks are still needed
  * when the CALLER finally runs an action. Deferring to Spark's
  * ContextCleaner does not work in a long-lived session: round 5's
  * bench showed q65's unreleased shingle + checkpoint blocks taxing
  * the four queries that ran after it (q34-q38 regressed 1.6-3.8×
  * with their code unchanged). The registry makes the lifecycle
  * explicit: operators register what they persist, and the driver
  * mains (Bench, Verify) — or any library caller — call
  * [[releaseAll]] once the consuming action has completed.
  *
  * Two kinds of entries:
  *  - DataFrames persisted through the catalog cache (`df.persist`) —
  *    released with `df.unpersist`;
  *  - raw RDD ids for `localCheckpoint` blocks (which bypass the
  *    catalog cache) — released through
  *    `sparkContext.getPersistentRDDs`. NOTE a localCheckpoint's
  *    blocks ARE its data (lineage is truncated): release only after
  *    the dependent result has been fully consumed — a further action
  *    on it would fail, not recompute.
  *
  * Thread safety: registration and release are concurrent-safe; the
  * intended pattern (register during one query's planning/execution,
  * release after its action) is sequential per session.
  */
object CacheRegistry {
  private val dfs = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  private val rdds =
    new java.util.concurrent.ConcurrentLinkedQueue[(org.apache.spark.SparkContext, Int)]()

  /** Track a DataFrame an operator just `persist`ed. Returns it. */
  def register(df: DataFrame): DataFrame = { dfs.add(df); df }

  /** Track localCheckpoint block RDDs by id (see class doc caveat). */
  def registerRddIds(sc: org.apache.spark.SparkContext, ids: Iterable[Int]): Unit =
    ids.foreach(id => rdds.add((sc, id)))

  /** Unpersist everything registered since the last release. Safe to
    * call when nothing is registered; safe against already-unpersisted
    * entries (unpersist is idempotent, missing RDD ids are skipped).
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    var df = dfs.poll()
    while (df != null) {
      try df.unpersist(blocking) catch { case _: Throwable => () }
      df = dfs.poll()
    }
    var e = rdds.poll()
    while (e != null) {
      val (sc, id) = e
      if (!sc.isStopped)
        sc.getPersistentRDDs.get(id).foreach { r =>
          try r.unpersist(blocking) catch { case _: Throwable => () }
        }
      e = rdds.poll()
    }
  }
}
