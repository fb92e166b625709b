package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table-integrity primitives for cross-snapshot comparison — the
  * "did replication/backfill/migration change anything" check that at
  * 100 TB must not involve a sort or a row-level diff.
  */
object Integrity {

  /** Order-independent table checksum: xxhash64 each row's selected
    * columns (Spark's seed-chained multi-column path), sum the signed
    * hashes EXACTLY in decimal(38,0) — integer addition commutes, so
    * any partitioning yields the same sum; a 64-bit overflow wrap
    * would too, but ANSI mode makes long-sum overflow an error, and
    * the decimal sum is portable to engines with 128-bit integers —
    * then fold to a non-negative BIGINT mod 2^63−1. Comparing two
    * snapshots is comparing two single-row results: one scan each, a
    * map-side-combinable sum, no shuffle of data rows at all, no
    * ordering assumption. A content change that preserves the sum
    * requires colliding the 64-bit hash sum — the standard integrity
    * trade. Returns (n_rows, checksum).
    */
  def tableChecksum(df: DataFrame, cols: Seq[Column]): DataFrame = {
    require(cols.nonEmpty, "cols must be non-empty")
    val p = "9223372036854775807" // 2^63 - 1
    df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("__h"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__h")).as("__s"))
      .select(col("n_rows"),
        expr(s"CAST(((__s % $p) + $p) % $p AS BIGINT)").as("checksum"))
  }

  /** Declarative data-quality expectation suite (the Deequ/
    * great-expectations pattern): evaluate a set of constraints
    * against a table and return one row per constraint —
    * (check_name, n_violations, pass). Three constraint families:
    *
    *  - `rowChecks`: (name, violation predicate) — completeness
    *    (`col.isNull`), bounds (`col <= 0`), set membership
    *    (`!col.isin(...)`), pattern conformance, … Any Boolean column.
    *  - `uniqueChecks`: (name, key columns) — duplicate key rows.
    *    Rows with a NULL in any key column are excluded from BOTH
    *    counts (null-key completeness is a rowCheck concern);
    *    violations = n_valid_rows − n_distinct_keys.
    *  - `refChecks`: (name, child key, parent table, parent key) —
    *    referential integrity; violations = child rows (non-null key)
    *    whose key has no parent. NULL child keys are not orphans.
    *
    * Scale shape: EVERY row-level and uniqueness metric computes in
    * ONE pass over the table — row checks are map-side-combinable
    * conditional counts; the distinct-count aggregates share the same
    * scan (Catalyst plans multi-distinct via Expand: the input
    * multiplies in-flight by the number of distinct keys, not by
    * re-scanning — keep uniqueness keys few on very wide suites).
    * Each referential check is its own anti-join job (AQE broadcasts
    * the deduped parent-key side when it fits); results union as
    * one-row frames. No collect, no driver state: the report is
    * itself a DataFrame, so a 100 TB audit emits a handful of rows.
    */
  def expectations(df: DataFrame,
                   rowChecks: Seq[(String, Column)],
                   uniqueChecks: Seq[(String, Seq[String])] = Nil,
                   refChecks: Seq[(String, Column, DataFrame, Column)] = Nil): DataFrame = {
    require(rowChecks.nonEmpty || uniqueChecks.nonEmpty || refChecks.nonEmpty,
      "at least one check required")
    val names = rowChecks.map(_._1) ++ uniqueChecks.map(_._1) ++ refChecks.map(_._1)
    require(names.distinct.size == names.size, s"duplicate check names in $names")

    val rowAggs = rowChecks.zipWithIndex.map { case ((_, viol), i) =>
      sum(when(viol, 1L).otherwise(0L)).as(s"__r$i")
    }
    val uniqAggs = uniqueChecks.zipWithIndex.flatMap { case ((_, keys), i) =>
      val valid = keys.map(col(_).isNotNull).reduce(_ && _)
      Seq(
        sum(when(valid, 1L).otherwise(0L)).as(s"__uv$i"),
        countDistinct(when(valid,
          if (keys.size == 1) col(keys.head) else struct(keys.map(col): _*))).as(s"__ud$i"))
    }
    val aggs = rowAggs ++ uniqAggs
    val scanned: Option[DataFrame] =
      if (aggs.isEmpty) None
      else {
        val one = df.agg(aggs.head, aggs.tail: _*)
        val metrics =
          rowChecks.zipWithIndex.map { case ((nm, _), i) =>
            struct(lit(nm).as("check_name"),
              coalesce(col(s"__r$i"), lit(0L)).as("n_violations"))
          } ++
          uniqueChecks.zipWithIndex.map { case ((nm, _), i) =>
            struct(lit(nm).as("check_name"),
              (coalesce(col(s"__uv$i"), lit(0L)) - col(s"__ud$i")).as("n_violations"))
          }
        Some(one.select(explode(array(metrics: _*)).as("m"))
          .select(col("m.check_name"), col("m.n_violations")))
      }
    val refs = refChecks.map { case (nm, childKey, parent, parentKey) =>
      df.select(childKey.as("__k")).filter(col("__k").isNotNull)
        .join(parent.select(parentKey.as("__k")).distinct(), Seq("__k"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(nm).as("check_name"), col("n_violations"))
    }
    (scanned.toSeq ++ refs).reduce(_.unionAll(_))
      .select(col("check_name"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** K-ANONYMITY audit over a set of quasi-identifier columns (the
    * re-identification risk check run before releasing or training on
    * user-adjacent data): every quasi-identifier combination that
    * appears, its population, and whether it satisfies k-anonymity —
    * a group smaller than `k` means those rows are re-identifiable by
    * joining the quasi-identifiers against any outside dataset.
    * Returns the quasi columns plus (n_rows, at_risk); feed `at_risk`
    * groups to suppression/generalization upstream.
    *
    * ONE map-side-combinable aggregate — group count is the whole
    * computation; no skew concern beyond the quasi-group sizes
    * themselves (the audit's own subject). NULL quasi-values form
    * their own group (SQL GROUP BY semantics — NULLs equal for
    * grouping on every engine).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }
}
