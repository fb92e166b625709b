package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL-frontier scheduling — the operator that CONSUMES the
  * politeness family's outputs ([[Robots.allowed]] verdicts,
  * [[Robots.crawlDelay]] delays, [[Sitemaps]] seeds): turn a set of
  * fetchable URLs into a per-host timetable a polite crawler can
  * execute.
  */
object Frontier {

  /** Politeness-scheduled fetch plan: within each host, URLs are
    * sequenced deterministically by `idCol` and spaced by the host's
    * crawl delay —
    *
    *   fetch_at_ms = t0Ms + seq · delay(host)
    *
    * with `defaultDelayMs` for hosts that declare none. `maxPerHost`
    * caps the scheduling horizon per round: URLs past the cap come
    * back with a NULL `fetch_at_ms` (deferred to the next round, not
    * silently dropped — frontier accounting must balance).
    *
    * Scale shape: ONE window per host (the frontier's unit of
    * seriality IS the host — that is what politeness means; cross-host
    * parallelism is free) and one broadcast join to the delay
    * dimension. A giant host makes a big partition by NATURE, not by
    * accident: the schedule itself says that host takes long, and
    * `maxPerHost` is the horizon (and skew) bound.
    *
    * Returns (idCol, url, host, seq, fetch_at_ms) — `seq` the 0-based
    * per-host position.
    */
  def fetchSchedule(urls: DataFrame, idCol: String, url: Column,
                    delays: DataFrame, t0Ms: Long,
                    defaultDelayMs: Long = 1000L,
                    maxPerHost: Int = 1000): DataFrame = {
    require(defaultDelayMs >= 0, s"negative defaultDelayMs: $defaultDelayMs")
    require(maxPerHost >= 1, s"maxPerHost must be positive, got $maxPerHost")
    val u = urls.select(col(idCol), url.as("url"),
      regexp_extract(url, "^https?://([^/?#]+)", 1).as("host"))
    val w = Window.partitionBy("host").orderBy(col(idCol))
    u.withColumn("seq", (row_number().over(w) - 1).cast("long"))
      .join(broadcast(delays), Seq("host"), "left_outer")
      .select(col(idCol), col("url"), col("host"), col("seq"),
        when(col("seq") < maxPerHost,
          lit(t0Ms) + col("seq") *
            coalesce(col("crawl_delay_ms"), lit(defaultDelayMs)))
          .as("fetch_at_ms"))
  }
}
