package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: queries execute through the noop sink — full plan runs
  * (joins, aggregates, formatting) with nothing collected — because a
  * bare count() would let Catalyst prune most of the work. A warmup
  * query amortizes session/codegen startup out of the first
  * measurement. AQE is on, shuffle partitions match cores.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    val names = SparkEntry.allQueries.map(_.name)
    // warmup: run the cheapest scan-shaped query once, untimed
    try SparkEntry.queries(names.head)(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => }

    val results = names.map(n => n -> execute(n))
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    // failed queries still count their elapsed time toward the total (a
    // crash must never IMPROVE the headline metric) and are listed
    val total = results.map(_._2._1).sum
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }.mkString("[", ",", "]")
    def jsonStr(x: String): String =
      "\"" + x.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":${jsonStr(sfDir)}}"""
    println(line)
    // also persist to a file — the stdout line is the contract, but log
    // tails get truncated (round 4 lost q01-q06 and the total that way)
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench.json"))
    java.nio.file.Files.write(out,
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
