package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the artifact/evaluation operators: bloom filter build +
  * probe, Pareto frontier, ranking metrics, link prediction.
  */
class EvalOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("eval-ops")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bloomBuild/bloomProbe: no false negatives, word packing replays") {
    import spark.implicits._
    val keys = (1L to 200L).toDF("k")
    val words = Sketches.bloomBuild(keys, col("k"), numBits = 1024, numHashes = 3)
    // driver-side replay of the packing for the same keys
    import org.apache.spark.sql.catalyst.expressions.XxHash64Function
    import org.apache.spark.sql.types.LongType
    def pos(i: Int, k: Long): Long = {
      val h = XxHash64Function.hash(k, LongType,
        XxHash64Function.hash(i.toLong, LongType, 42L))
      java.lang.Math.floorMod(h, 1024L)
    }
    val expect = (for { k <- 1L to 200L; i <- 0 until 3 } yield pos(i, k))
      .groupBy(_ / 64)
      .map { case (w, ps) =>
        w.toInt -> ps.distinct.map(p => 1L << (p % 64)).reduce(_ | _)
      }
    val got = words.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === expect)

    // every inserted key hits; a disjoint probe range is mostly absent
    val probes = ((1L to 200L) ++ (100000L to 100199L)).toDF("k")
    val hits = Sketches.bloomProbe(words, probes, "k", 1024, 3)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 200L).forall(hits(_)), "bloom has a false negative")
    val fp = (100000L to 100199L).count(hits(_))
    // 1024 bits / 200 keys / 3 hashes → FP rate ≈ 11%; 200 trials
    assert(fp < 60, s"implausible false-positive count $fp/200")
    assertThrows[IllegalArgumentException] {
      Sketches.bloomBuild(keys, col("k"), numBits = 1000, numHashes = 3)
    }
  }

  test("paretoFrontier: dominance semantics, duplicate counting, bucket invariance") {
    import spark.implicits._
    // frontier: (5,1), (3,3), (1,5); dominated: (2,2) by (3,3),
    // (3,1) by (5,1)/(3,3), (1,1) by everything; (5,1) duplicated
    val pts = Seq((5L, 1L), (5L, 1L), (3L, 3L), (1L, 5L),
      (2L, 2L), (3L, 1L), (1L, 1L)).toDF("x", "y")
    val got = Profiling.paretoFrontier(pts, col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((5L, 1L, 2L), (3L, 3L, 1L), (1L, 5L, 1L)))
    // result is independent of the local-prune bucket count
    for (b <- Seq(1, 7, 64)) {
      val g = Profiling.paretoFrontier(pts, col("x"), col("y"), buckets = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(g === got, s"buckets=$b diverged")
    }
  }

  test("rankingMetrics: hand-computed NDCG/MRR, no-relevant queries excluded") {
    import spark.implicits._
    // q1: ranked (d1,d2,d3), relevant {d2, d9} → hit at rank 2 only
    // q2: ranked (d1,d2,d3), relevant {d1, d2} → hits at ranks 1,2
    // q3: ranked (d1,d2,d3), no relevant docs → excluded
    val ranked = (for { q <- Seq("q1", "q2", "q3"); (dd, r) <- Seq(("d1", 1L), ("d2", 2L), ("d3", 3L)) }
      yield (q, dd, r)).toDF("query_id", "doc_id", "rank")
    val truth = Seq(("q1", "d2"), ("q1", "d9"), ("q2", "d1"), ("q2", "d2"))
      .toDF("query_id", "doc_id")
    val disc = Retrieval.ndcgDiscountMicro(3).toMap
    val m = Retrieval.rankingMetrics(ranked, truth, k = 3)
      .collect().map(r => r.getAs[String]("query_id") -> r).toMap
    assert(m.keySet === Set("q1", "q2"))
    val q1 = m("q1")
    assert(q1.getAs[Long]("dcg_micro") === disc(2))
    // ideal for n_rel=2: relevant docs at ranks 1 and 2
    assert(q1.getAs[Long]("idcg_micro") === disc(1) + disc(2))
    assert(q1.getAs[Long]("rr_micro") === 500000L)
    assert(q1.getAs[Long]("hits_at_k") === 1L)
    assert(q1.getAs[Long]("n_rel") === 2L)
    assert(q1.getAs[Long]("recall_ppm") === 500000L)
    assert(q1.getAs[Long]("ndcg_ppm") ===
      1000000L * disc(2) / (disc(1) + disc(2)))
    val q2 = m("q2")
    assert(q2.getAs[Long]("dcg_micro") === disc(1) + disc(2))
    assert(q2.getAs[Long]("ndcg_ppm") === 1000000L)
    assert(q2.getAs[Long]("rr_micro") === 1000000L)
  }

  test("resourceAllocationLinks: shared-unit scoring, hub cap, minCommon") {
    import spark.implicits._
    // unit u1 shared by a,b,c (deg 3); u2 by a,b (deg 2); hub by all 4
    val links = Seq(
      ("a", "u1"), ("b", "u1"), ("c", "u1"),
      ("a", "u2"), ("b", "u2"),
      ("a", "hub"), ("b", "hub"), ("c", "hub"), ("d", "hub")).toDF("ent", "u")
    val got = Graphs.resourceAllocationLinks(links, "ent", "u",
        minCommon = 1, maxUnitDegree = 3)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // hub (deg 4) dropped: a–b share u1+u2, a–c and b–c share u1 only
    assert(got === Map(
      ("a", "b") -> ((2L, 1000000L / 3 + 500000L)),
      ("a", "c") -> ((1L, 1000000L / 3)),
      ("b", "c") -> ((1L, 1000000L / 3))))
    val filtered = Graphs.resourceAllocationLinks(links, "ent", "u",
      minCommon = 2, maxUnitDegree = 3)
    assert(filtered.collect().map(r => (r.getString(0), r.getString(1))).toSet
      === Set(("a", "b")))
  }
}
