package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FrontierSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("frontier")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("fetchSchedule: per-host spacing, default delay, horizon deferral") {
    val s = spark
    import s.implicits._
    val urls = Seq(
      (1L, "http://a.x/p1"), (3L, "http://a.x/p3"), (2L, "http://a.x/p2"),
      (4L, "http://b.x/q1"), (5L, "http://b.x/q2"), (6L, "http://b.x/q3")
    ).toDF("id", "url")
    val delays = Seq(("a.x", 2500L)).toDF("host", "crawl_delay_ms")
    val got = Frontier.fetchSchedule(urls, "id", col("url"), delays,
      t0Ms = 1000000L, defaultDelayMs = 1000L, maxPerHost = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // a.x: sequenced by id (1,2,3), spaced by its declared 2.5 s
    assert(got(1L) === (("a.x", 0L, 1000000L)))
    assert(got(2L) === (("a.x", 1L, 1002500L)))
    // past the 2-URL horizon: deferred (null), never dropped
    assert(got(3L) === (("a.x", 2L, -1L)))
    // b.x has no declared delay -> the 1 s default; independent seq
    assert(got(4L) === (("b.x", 0L, 1000000L)))
    assert(got(5L) === (("b.x", 1L, 1001000L)))
    assert(got(6L) === (("b.x", 2L, -1L)))
    assert(got.size === 6) // accounting balances: every URL comes back
  }
}
