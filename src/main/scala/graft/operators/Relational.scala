package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators, re-expressed Spark-first from the
  * reference's hand-fused pipeline (SURVEY.md §2).
  *
  * Every operator here is a pure DataFrame transform so Catalyst can
  * push filters/prune columns through it; nothing collects to the
  * driver. At 100 TB these run as shuffle-partitioned hash aggregates /
  * sort-merge joins with AQE skew splitting.
  */
object Relational {

  /** Hash-stable integer cents for a double money column — double
    * aggregation order differs between engines, so correctness oracles
    * compare `round(sum*100)` as int64 instead of raw doubles.
    */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** F3 (reference `src/history_filter.cpp:30-245`): latest version per
    * key. The reference streams sorted rows and keeps row i iff the next
    * row changes id, carrying block-boundary state; in Spark this is a
    * single window — whole partitions are visible, no carry-over state.
    *
    * For 100 TB prefer the `max_by`-style groupBy (partial-aggregates
    * map-side) over `row_number` (full sort per partition) when only the
    * latest row is needed; both are provided.
    */
  def latestVersion(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Same semantics via groupBy + max_by(struct): partial-aggregatable,
    * so the shuffle carries one row per (key) per map task, not all rows.
    * `version` must totally order rows within a key.
    */
  def latestVersionAgg(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col): _*)
    val ord = struct(version: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("__row"))
      .select(df.columns.map(c => col(s"__row.$c")): _*)
  }

  /** J1–J3 (reference `src/copy_elements.cpp:166-235`): 1:N child rows
    * collected into an ordered array per parent key. The reference does a
    * streaming sort-merge with a cursor; Spark expresses it as
    * groupBy + sort_array(collect_list(struct(ord, payload...))) — the
    * sort key leads the struct so array_sort order == child order.
    * Returns parent keys + `colName` array of the payload struct.
    */
  def collectOrdered(child: DataFrame, keys: Seq[String], ord: Seq[String],
                     payload: Seq[String], colName: String): DataFrame = {
    val st = struct((ord ++ payload).map(col): _*)
    child.groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(st)).as(colName))
  }

  /** J4 (reference `src/copy_elements.cpp:328-337`): broadcast dimension
    * lookup, left-outer so misses survive as nulls (anonymous users).
    * `dim` must be small enough to broadcast (users table ≪ elements).
    */
  def broadcastLookup(fact: DataFrame, dim: DataFrame, factKey: String,
                      dimKey: String): DataFrame =
    fact.join(broadcast(dim), fact(factKey) === dim(dimKey), "left_outer")

  /** Skew-resistant two-phase ordered collect: identical result to
    * [[collectOrdered]], but a hot key's rows first combine under
    * (keys, salt) — spreading one giant group (a mega-relation's 100k
    * members, a viral user's events) across `salts` reducers — and the
    * per-salt arrays then flatten + sort in a second, tiny aggregation.
    * The phase-2 array sort is in-memory per group; the win is that no
    * single reducer receives the hot key's full row stream.
    */
  def collectOrderedSalted(child: DataFrame, keys: Seq[String], ord: String,
                           payload: Seq[String], colName: String,
                           salts: Int = 32): DataFrame = {
    val st = struct((ord +: payload).map(col): _*)
    child
      .groupBy((keys.map(col) :+ pmod(col(ord), lit(salts)).as("__salt")): _*)
      .agg(collect_list(st).as("__part"))
      .groupBy(keys.map(col): _*)
      .agg(array_sort(flatten(collect_list(col("__part")))).as(colName))
  }
}
