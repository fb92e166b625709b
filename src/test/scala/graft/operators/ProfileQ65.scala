package graft.operators

// Dev-only stage profiler for the composed curation pipeline (not a
// spec; run with `Test/runMain graft.operators.ProfileQ65`). Mirrors
// CurationPipeline.curate stage by stage at sf0.1 with a timed action
// after each, so the bench cost decomposes.
object ProfileQ65 {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.functions.TextFunctions._
    val cfg = CurationPipeline.Config()
    val docs = graft.Tables.documents(spark, d).filter(col("doc_id") % 50 =!= 0)
    val bench = graft.Tables.documents(spark, d).filter(col("doc_id") % 50 === 0)
    t("warmup scan")(docs.write.format("noop").mode("overwrite").save())

    val base = docs.select(col("doc_id"),
      graft.plans.NfcNormalize.nfc_normalize(col("text")).as("text"))
    val scrubbed = base.withColumn("text", redactPii(col("text")))
    val scored = scrubbed
      .withColumn("quality_milli", qualityScoreMilli(col("text"), cfg.stopwords))
      .filter(col("quality_milli") >= cfg.minQualityMilli)
    val byHash = org.apache.spark.sql.expressions.Window.partitionBy(md5(col("text")))
    val exact = scored
      .withColumn("__keep", min("doc_id").over(byHash))
      .filter(col("doc_id") === col("__keep")).drop("__keep")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("exact cache build")(exact.count())
    val pairs = Dedup.minhashLshPairs(exact, "doc_id", col("text"),
      minJaccardPpm = cfg.nearDupJaccardPpm)
    t("lsh pairs")(println("  pairs=" + pairs.count()))
    val losers = t("connected components")(
      Dedup.connectedComponents(pairs)
        .filter(col("v") =!= col("lbl")).select(col("v").as("doc_id")))
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")
    t("anti-join deduped")(deduped.write.format("noop").mode("overwrite").save())
    val contaminated = Dedup
      .ngramContamination(deduped, "doc_id", col("text"), bench, col("text"))
      .filter(col("n_hit") > cfg.contaminationMaxHits).select("doc_id")
    val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
    val out = clean.withColumn("split",
      when(pmod(xxhash64(col("doc_id")), lit(100)) < 100 - cfg.valPercent, "train")
        .otherwise("val"))
    t("decontaminate + final")(out.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
