package graft.osm

import java.io.{BufferedOutputStream, FileOutputStream}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.osm.pbf.PbfWriter

/** PBF planet sink (K2): feeds the sorted assembled DataFrames through
  * the sequential [[PbfWriter]].
  *
  * The PBF block/group layout is inherently sequential state (string
  * table per block, running deltas, byte-size flush heuristics), so —
  * exactly like the reference's single writer thread — final encoding is
  * one stream; Spark does everything up to it distributed (join,
  * attribution, sort) and `toLocalIterator` streams ranges in order
  * without materializing the dataset. For cluster-scale parallel
  * encoding, partition-per-block variants are possible (blocks are
  * independent after the header) at the cost of byte-identical layout.
  */
object PlanetPbf {

  private def tsSec(t: java.sql.Timestamp): Long = Math.floorDiv(t.getTime, 1000L)

  def write(path: String, generator: String, history: Boolean, anon: Boolean,
            maxTime: Option[java.sql.Timestamp],
            nodes: DataFrame, ways: DataFrame, relations: DataFrame,
            denseNodes: Boolean = true): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path), 1 << 16)
    val w = new PbfWriter(out, generator, history, anon, denseNodes, maxTime)
    try {
      nodes.orderBy(col("id"), col("version")).toLocalIterator().forEachRemaining { r =>
        w.node(r.getAs[Long]("id"), r.getAs[Boolean]("visible"),
          r.getAs[Int]("latitude"), r.getAs[Int]("longitude"),
          r.getAs[Long]("version"), tsSec(r.getAs[java.sql.Timestamp]("timestamp")),
          r.getAs[Long]("changeset_id"), r.getAs[java.lang.Long]("attr_uid"),
          r.getAs[String]("user_name"), tagsOf(r))
      }
      ways.orderBy(col("id"), col("version")).toLocalIterator().forEachRemaining { r =>
        w.way(r.getAs[Long]("id"), r.getAs[Boolean]("visible"),
          r.getAs[Long]("version"), tsSec(r.getAs[java.sql.Timestamp]("timestamp")),
          r.getAs[Long]("changeset_id"), r.getAs[java.lang.Long]("attr_uid"),
          r.getAs[String]("user_name"),
          r.getAs[scala.collection.Seq[Long]]("nds").iterator, tagsOf(r))
      }
      relations.orderBy(col("id"), col("version")).toLocalIterator().forEachRemaining { r =>
        w.relation(r.getAs[Long]("id"), r.getAs[Boolean]("visible"),
          r.getAs[Long]("version"), tsSec(r.getAs[java.sql.Timestamp]("timestamp")),
          r.getAs[Long]("changeset_id"), r.getAs[java.lang.Long]("attr_uid"),
          r.getAs[String]("user_name"),
          r.getAs[scala.collection.Seq[Row]]("members").iterator.map(m =>
            (m.getAs[String]("mtype"), m.getAs[Long]("mref"), m.getAs[String]("mrole"))),
          tagsOf(r))
      }
      w.finish()
    } finally out.close()
  }

  private def tagsOf(r: Row): Iterator[(String, String)] =
    r.getAs[scala.collection.Seq[Row]]("tags").iterator
      .map(t => (t.getAs[String]("k"), t.getAs[String]("v")))
}
