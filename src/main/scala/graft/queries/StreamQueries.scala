package graft.queries

import graft.Tables
import graft.operators.Relational.cents
import graft.streaming.EventStreams
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CORRECTNESS gates for the streaming operator family — each drives
  * the ACTUAL foreachBatch closure (the per-trigger logic a
  * `writeStream.foreachBatch(...)` would run) over a deterministic
  * sequence of batch DataFrames, with the external store realized as
  * real parquet dirs (the durable-sink contract the operators
  * document). The MemoryStream specs in EventStreamsSpec keep the
  * watermark/state semantics; these gates hash-verify the per-trigger
  * TRANSFORM against the DuckDB oracle — the q57/q121 batch-parity
  * precedent applied to the three foreachBatch operators, closing the
  * one operator family that had no CORRECTNESS row (r7 verdict #1).
  */
object StreamQueries {

  /** Oracle for q204: the three-batch CDC replay collapses to "per
    * key, the max-(batch, ver) change wins; op 'D' removes; untouched
    * keys keep the base row" — the algebraic closed form of folding
    * compact-then-merge over the batch sequence.
    */
  private val cdcReplayOracleSql: String =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |         CAST(0 AS BIGINT) AS ver, o_totalprice
      |  FROM orders),
      |changes AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(1 AS BIGINT) AS ver,
      |         o_totalprice * 2 AS o_totalprice, 'U' AS op, 1 AS batch
      |  FROM base WHERE o_orderkey % 10 = 5
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(2 AS BIGINT),
      |         o_totalprice * 3, 'U', 1
      |  FROM base WHERE o_orderkey % 10 = 5
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(1 AS BIGINT),
      |         o_totalprice, 'D', 1
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(1 AS BIGINT),
      |         o_totalprice + 1000, 'U', 2
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(1 AS BIGINT),
      |         o_totalprice, 'D', 2
      |  FROM base WHERE o_orderkey % 10 = 5
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(2 AS BIGINT),
      |         o_totalprice + 2000, 'U', 3
      |  FROM base WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(1 AS BIGINT),
      |         o_totalprice * 10, 'U', 3
      |  FROM base WHERE o_orderkey % 10 = 7
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(1 AS BIGINT),
      |         o_totalprice * 4, 'U', 3
      |  FROM base WHERE o_orderkey % 10 = 3
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, CAST(2 AS BIGINT),
      |         o_totalprice, 'D', 3
      |  FROM base WHERE o_orderkey % 10 = 3),
      |last AS (
      |  SELECT * FROM changes
      |  QUALIFY row_number() OVER (PARTITION BY o_orderkey
      |                             ORDER BY batch DESC, ver DESC) = 1),
      |merged AS (
      |  SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.ver, b.o_totalprice
      |  FROM base b
      |  WHERE NOT EXISTS (SELECT 1 FROM last l WHERE l.o_orderkey = b.o_orderkey)
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, ver, o_totalprice
      |  FROM last WHERE op = 'U')
      |SELECT o_orderkey, o_custkey,
      |       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
      |       o_orderstatus, ver
      |FROM merged""".stripMargin

  /** Oracle for q205: per non-empty batch, the q152 drift SQL with the
    * batch's own total as n_b's denominator — categories present in
    * the reference but absent from the batch (and vice versa) carry
    * their full mass as drift, exactly distributionDrift's full-outer.
    */
  private val driftMonitorOracleSql: String =
    """WITH ref AS (
      |  SELECT event_type AS category, count(*) AS n_a
      |  FROM events WHERE epoch_us(ts) < 1705363200000000 GROUP BY 1),
      |ta AS (SELECT CAST(sum(n_a) AS BIGINT) AS t FROM ref),
      |bt AS (
      |  SELECT CAST((epoch_us(ts) // 86400000000) % 3 AS BIGINT) AS batch_id,
      |         event_type AS category, count(*) AS n_b
      |  FROM events WHERE epoch_us(ts) >= 1705363200000000 GROUP BY 1, 2),
      |tb AS (SELECT batch_id, CAST(sum(n_b) AS BIGINT) AS t FROM bt GROUP BY 1),
      |spine AS (SELECT DISTINCT batch_id FROM bt),
      |cats AS (
      |  SELECT s.batch_id, r.category FROM spine s CROSS JOIN ref r
      |  UNION
      |  SELECT batch_id, category FROM bt),
      |j AS (
      |  SELECT c.batch_id, c.category,
      |         CAST(coalesce(r.n_a, 0) AS BIGINT) AS n_a,
      |         CAST(coalesce(b.n_b, 0) AS BIGINT) AS n_b
      |  FROM cats c
      |  LEFT JOIN ref r ON r.category = c.category
      |  LEFT JOIN bt b ON b.batch_id = c.batch_id AND b.category = c.category)
      |SELECT j.batch_id, j.category, j.n_a, j.n_b,
      |       CAST((1000000 * abs(j.n_a * tb.t - j.n_b * ta.t))
      |            // (2 * ta.t * tb.t) AS BIGINT) AS tvd_contrib_ppm
      |FROM j JOIN tb ON tb.batch_id = j.batch_id CROSS JOIN ta""".stripMargin

  /** Oracle for q206: the three-trigger incremental-dedup fold,
    * sequentially — within-batch exact keepers (min doc_id per md5),
    * then per batch k the drops against the running survivor store:
    * exact (md5 equality with any survivor) or near-dup (a verified
    * xxhash64-LSH pair at >= 800000 ppm with any survivor). The LSH
    * chain is the bit-exact q29 rebuild (minhashXxPairCtes) over the
    * within-batch keepers; signatures depend only on a doc's own text,
    * so one global chain serves every trigger and the sequencing lives
    * entirely in the survivor CTEs.
    */
  private val incrementalDedupOracleSql: String =
    s"""WITH docsrc AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000, text FROM documents WHERE doc_id % 50 = 0),
       |batched AS (
       |  SELECT doc_id, CAST(doc_id % 3 AS BIGINT) AS batch_id, text FROM docsrc),
       |wb AS (
       |  SELECT doc_id, batch_id, text FROM (
       |    SELECT doc_id, batch_id, text,
       |           min(doc_id) OVER (PARTITION BY batch_id, md5(text)) AS mn
       |    FROM batched) WHERE doc_id = mn),
       |${TextQueries.minhashXxPairCtes("wb")},
       |nd AS (
       |  SELECT id_a, id_b FROM lshpairs WHERE jaccard_ppm >= 800000
       |  UNION
       |  SELECT id_b, id_a FROM lshpairs WHERE jaccard_ppm >= 800000),
       |s0 AS (SELECT doc_id, batch_id, text FROM wb WHERE batch_id = 0),
       |s1 AS (
       |  SELECT * FROM s0
       |  UNION ALL
       |  SELECT w.doc_id, w.batch_id, w.text FROM wb w
       |  WHERE w.batch_id = 1
       |    AND NOT EXISTS (SELECT 1 FROM s0 e WHERE md5(e.text) = md5(w.text))
       |    AND NOT EXISTS (SELECT 1 FROM nd JOIN s0 e ON nd.id_b = e.doc_id
       |                    WHERE nd.id_a = w.doc_id)),
       |s2 AS (
       |  SELECT * FROM s1
       |  UNION ALL
       |  SELECT w.doc_id, w.batch_id, w.text FROM wb w
       |  WHERE w.batch_id = 2
       |    AND NOT EXISTS (SELECT 1 FROM s1 e WHERE md5(e.text) = md5(w.text))
       |    AND NOT EXISTS (SELECT 1 FROM nd JOIN s1 e ON nd.id_b = e.doc_id
       |                    WHERE nd.id_a = w.doc_id))
       |SELECT doc_id, batch_id FROM s2""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // STREAMING CDC SINK REPLAY: EventStreams.cdcForeachBatch — the
    // per-trigger compact (latestVersionAgg, max ver per key within
    // the batch) + merge (applyCdc) closure — driven over three change
    // batches against a REAL parquet snapshot (ping-pong dirs: each
    // trigger reads snap_{k-1}, writes snap_k — the atomic-swap
    // contract the operator documents). Covers: within-batch
    // compaction (key updated twice, ver 2 wins), delete, resurrect
    // after delete, cross-batch override, and same-batch U-then-D
    // (compaction keeps the D → key gone). The oracle is the fold's
    // closed form: max-(batch, ver) change per key.
    QueryDef.sql("q204_stream_cdc_replay", cdcReplayOracleSql) {
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"), lit(0L).as("ver"), col("o_totalprice"))
        def u(m: Int, ver: Long, price: Column => Column): DataFrame =
          o.filter(col("o_orderkey") % 10 === m).withColumn("ver", lit(ver))
            .withColumn("o_totalprice", price(col("o_totalprice")))
            .withColumn("op", lit("U"))
        def del(m: Int, ver: Long): DataFrame =
          o.filter(col("o_orderkey") % 10 === m).withColumn("ver", lit(ver))
            .withColumn("op", lit("D"))
        val b1 = u(5, 1, _ * 2).unionByName(u(5, 2, _ * 3)).unionByName(del(0, 1))
        val b2 = u(0, 1, _ + 1000).unionByName(del(5, 1))
        val b3 = u(0, 2, _ + 2000).unionByName(u(7, 1, _ * 10))
          .unionByName(u(3, 1, _ * 4)).unionByName(del(3, 2))
        val root = graft.operators.Scratch.dir(
          s"graft_cdc_replay_${new java.io.File(d).getName}")
        var snap = s"$root/snap_0"
        var k = 0
        o.write.mode("overwrite").parquet(snap)
        val fn = EventStreams.cdcForeachBatch(Seq("o_orderkey"), Seq("ver"))(
          () => s.read.parquet(snap),
          df => {
            k += 1
            val p = s"$root/snap_$k"
            df.write.mode("overwrite").parquet(p)
            snap = p
          })
        fn(b1, 1L); fn(b2, 2L); fn(b3, 3L)
        s.read.parquet(snap).select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("price_cents"), col("o_orderstatus"),
          col("ver"))
      }
    },

    // STREAMING DRIFT MONITOR: EventStreams.driftForeachBatch — the
    // per-trigger distributionDrift-against-reference closure — driven
    // over three event micro-batches (second half-month, split by day
    // mod 3) against the first half-month as the fixed reference; the
    // sink tags each emission with its batch id, exactly what a
    // metrics table keyed on batch id would store. Empty batches emit
    // nothing (the closure's isEmpty guard); every batch here is
    // non-empty at all gate SFs (verified against the testdata).
    QueryDef.sql("q205_stream_drift_monitor", driftMonitorOracleSql) {
      (s, d) => {
        val cut = 1705363200000000L // 2024-01-16T00:00Z, the q152 split
        val ev = Tables.events(s, d).withColumn("__us", unix_micros(col("ts")))
        val ref = ev.filter(col("__us") < cut).select(col("event_type"))
        val rest = ev.filter(col("__us") >= cut)
          .withColumn("__b", expr("(__us div 86400000000) % 3"))
        val outs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
        val fn = EventStreams.driftForeachBatch("event_type")(
          () => ref,
          (df, id) => outs += df.withColumn("batch_id", lit(id)))
        (0L until 3L).foreach(k => fn(rest.filter(col("__b") === k), k))
        outs.reduce(_.unionByName(_))
          .select(col("batch_id"), col("category"), col("n_a"), col("n_b"),
            col("tvd_contrib_ppm"))
      }
    },

    // STREAMING INCREMENTAL DEDUP: EventStreams.
    // incrementalDedupForeachBatch — the per-trigger within-batch
    // exact dedup + store-exact anti-join + cross-LSH-vs-stored-
    // signatures closure — driven over three document micro-batches
    // (doc_id mod 3) with the store as REAL parquet dirs (one docs +
    // sigs dir per trigger: append-as-new-dirs, so no plan ever reads
    // the dir it is writing). The input replays every 50th doc under a
    // new id in a LATER batch so the exact path provably drops rows;
    // the corpus's own >= 0.9-jaccard near-dup families exercise the
    // LSH path at the operator's default 800000 ppm threshold. Output
    // is the final store: every surviving doc with the trigger that
    // admitted it.
    QueryDef.sql("q206_stream_incremental_dedup", incrementalDedupOracleSql) {
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val src = base.unionByName(
            base.filter(col("doc_id") % 50 === 0)
              .withColumn("doc_id", col("doc_id") + 1000L))
          .withColumn("batch_id", col("doc_id") % 3)
        val root = graft.operators.Scratch.dir(
          s"graft_incdedup_${new java.io.File(d).getName}")
        var docDirs = Vector.empty[String]
        var sigDirs = Vector.empty[String]
        val fn = EventStreams.incrementalDedupForeachBatch("doc_id", "text")(
          () => if (docDirs.isEmpty) None
                else Some((s.read.parquet(docDirs: _*), s.read.parquet(sigDirs: _*))),
          (dd, sg) => {
            val k = docDirs.size
            dd.write.mode("overwrite").parquet(s"$root/docs_$k")
            sg.write.mode("overwrite").parquet(s"$root/sigs_$k")
            docDirs :+= s"$root/docs_$k"
            sigDirs :+= s"$root/sigs_$k"
          })
        (0L until 3L).foreach(k => fn(src.filter(col("batch_id") === k), k))
        s.read.parquet(docDirs: _*).select(col("doc_id"), col("batch_id"))
      }
    })
}
