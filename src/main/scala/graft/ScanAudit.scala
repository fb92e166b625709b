package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{ShuffleExchangeExec, BroadcastExchangeExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dev-only plan audit: per gate query, how many parquet scans of each
  * table and how many shuffle exchanges the INITIAL physical plan has.
  * Flags repeated scans of the same fact table — the pattern behind the
  * q91/q92/q98/q100 scalar-subquery recomputation fixes. (AQE may dedup
  * some at runtime via exchange reuse; the static count is the
  * conservative signal worth eyeballing.)
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: walk(a.executedPlan)
      case _ => p +: (p.children ++ p.subqueries).flatMap(walk)
    }
    SparkEntry.allQueries.foreach { q =>
      try {
        val plan = q.fn(spark, d).queryExecution.executedPlan
        val nodes = walk(plan)
        val scans = nodes.collect { case s: FileSourceScanExec =>
          s.relation.location.rootPaths.headOption.map(_.getName).getOrElse("?") }
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val bcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
        val dup = scans.groupBy(identity).collect { case (t, xs) if xs.size > 1 => s"$t x${xs.size}" }
        println(f"${q.name}%-34s scans=${scans.size}%2d shuffle=$shuffles%2d bcast=$bcasts%2d ${if (dup.nonEmpty) "DUP: " + dup.mkString(", ") else ""}")
      } catch { case e: Throwable => println(s"${q.name} ERROR ${e.getMessage.take(80)}") }
      graft.operators.CacheRegistry.releaseAll()
    }
    spark.stop()
  }
}
