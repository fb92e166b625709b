package graft.queries

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity search over the embeddings table (64-dim float vectors). */
object VectorQueries {

  val all: Seq[QueryDef] = Seq(

    QueryDef.sql("q34_embedding_norm",
      """SELECT vec_id,
        |       CAST(round(sqrt(list_sum(list_transform(embedding,
        |            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000) AS BIGINT) AS norm_e4,
        |       len(embedding) AS dim
        |FROM embeddings""".stripMargin) {
      (s, d) =>
        Tables.embeddings(s, d).select(col("vec_id"),
          round(Similarity.norm(col("embedding")) * 10000).cast("long").as("norm_e4"),
          size(col("embedding")).cast("long").as("dim"))
    },

    // Brute-force exact cosine top-k for a query batch — the ANN
    // correctness baseline.
    QueryDef.sql("q35_cosine_topk",
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT query_id, v.vec_id AS neighbor_id,
        |    CAST(round(
        |      list_sum(list_transform(list_zip(qe, v.embedding),
        |               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(v.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      * 1000000.0) AS BIGINT) AS cosine_ppm
        |  FROM q, embeddings v WHERE v.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine_ppm,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cosine_ppm DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank, cosine_ppm
        |FROM ranked WHERE rank <= 5""".stripMargin) {
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.bruteForceTopK(e, "vec_id", "embedding",
          e.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      }
    },

    // LSH-bucketed ANN (scale path) — signature hashing not oracle-
    // expressible → rows-only.
    QueryDef.rowsOnly("q36_cosine_ann_lsh") {
      (s, d) =>
        Similarity.lshTopK(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)
    },

    // IVF-partitioned ANN (the other scale path besides LSH: broadcast
    // centroid assignment + cell-keyed join). Centroid choice is
    // md5-ordered (oracle-expressible) and cell ranking uses the
    // ppm-rounded similarity, so the full pipeline hash-verifies.
    QueryDef.sql("q38_cosine_ann_ivf",
      """WITH v AS (SELECT vec_id AS vid, embedding AS vec FROM embeddings),
        |cent AS (SELECT vid AS cid, vec AS cvec FROM v
        |         ORDER BY md5(CAST(vid AS VARCHAR)), vid LIMIT 16),
        |sims AS (
        |  SELECT v.vid, v.vec, c.cid,
        |    CAST(round(
        |      list_sum(list_transform(list_zip(v.vec, c.cvec),
        |               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(v.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(c.cvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      * 1000000.0) AS BIGINT) AS sim
        |  FROM v, cent c),
        |cells AS (
        |  SELECT vid, vec, cid,
        |         row_number() OVER (PARTITION BY vid ORDER BY sim DESC, cid) AS r
        |  FROM sims),
        |assigned AS (SELECT vid, vec, cid AS cell FROM cells WHERE r = 1),
        |probes AS (SELECT vid AS query_id, vec AS qe, cid AS cell FROM cells WHERE r <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vid AS neighbor_id,
        |    CAST(round(
        |      list_sum(list_transform(list_zip(p.qe, a.vec),
        |               q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)))
        |      / (sqrt(list_sum(list_transform(p.qe, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
        |         * sqrt(list_sum(list_transform(a.vec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
        |      * 1000000.0) AS BIGINT) AS cosine_ppm
        |  FROM probes p JOIN assigned a ON p.cell = a.cell AND p.query_id <> a.vid),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine_ppm,
        |         row_number() OVER (PARTITION BY query_id
        |                            ORDER BY cosine_ppm DESC, neighbor_id) AS rank
        |  FROM scored)
        |SELECT query_id, neighbor_id, rank, cosine_ppm FROM ranked WHERE rank <= 3""".stripMargin) {
      (s, d) =>
        Similarity.ivfTopK(Tables.embeddings(s, d), "vec_id", "embedding", k = 3)
    },

    // Embedding near-duplicate pairs above 0.35 cosine (this synthetic
    // table's near-dup regime; max pairwise cosine is ~0.51) — rows-only
    // (LSH-bucketed; exact threshold verified).
    QueryDef.rowsOnly("q37_cosine_near_dup") {
      (s, d) =>
        Similarity.cosineNearDupPairs(Tables.embeddings(s, d), "vec_id", "embedding",
          minCosinePpm = 350000L)
    }
  )
}
