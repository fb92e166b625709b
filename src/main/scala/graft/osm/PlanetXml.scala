package graft.osm

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import XmlFormat._

/** Render assembled DataFrames to per-element XML snippets (K1).
  *
  * The reference streams elements through libxml2 on one thread
  * (`src/xml_writer.cpp:410-639`); here formatting runs distributed —
  * each executor renders its sorted range of elements, and the sink
  * concatenates ranges in order. Attribute order, indentation (libxml2
  * one-space indent), escaping, and conditional attributes reproduce the
  * reference byte-for-byte.
  */
object PlanetXml {

  /** `open = closed_at > max_time` (`src/xml_writer.cpp:454-460`). */
  private def isOpen(closedAt: java.sql.Timestamp, maxTime: Option[java.sql.Timestamp]): Boolean =
    maxTime match {
      case Some(mt) => closedAt != null && closedAt.after(mt)
      case None => true // max_time = -infinity
    }

  def renderChangesets(df: DataFrame, anon: Boolean, discussions: Boolean,
                       maxTime: Option[java.sql.Timestamp]): Dataset[String] = {
    val sorted = df.orderBy(col("id"))
    sorted.map { r =>
      val sb = new java.lang.StringBuilder(256)
      sb.append(" <changeset")
      attrRaw(sb, "id", r.getAs[Long]("id").toString)
      attrRaw(sb, "created_at", iso(r.getAs[java.sql.Timestamp]("created_at")))
      val closedAt = r.getAs[java.sql.Timestamp]("closed_at")
      val open = isOpen(closedAt, maxTime)
      if (!open) attrRaw(sb, "closed_at", iso(closedAt))
      attrRaw(sb, "open", if (open) "true" else "false")
      val userName = r.getAs[String]("user_name")
      if (!anon && userName != null) {
        attr(sb, "user", userName)
        attrRaw(sb, "uid", r.getAs[Long]("uid").toString)
      }
      val bbox = Seq("min_lat", "min_lon", "max_lat", "max_lon").map(f =>
        Option(r.getAs[java.lang.Integer](f)))
      if (bbox.forall(_.isDefined))
        bbox.zip(Seq("min_lat", "min_lon", "max_lat", "max_lon")).foreach {
          case (v, n) => attrRaw(sb, n, coord(v.get))
        }
      attrRaw(sb, "num_changes", r.getAs[Int]("num_changes").toString)
      val comments = r.getAs[scala.collection.Seq[Row]]("comments")
      attrRaw(sb, "comments_count", comments.size.toString)

      val tags = r.getAs[scala.collection.Seq[Row]]("tags")
      val hasDiscussion = discussions && comments.nonEmpty
      if (tags.isEmpty && !hasDiscussion) sb.append("/>\n")
      else {
        sb.append(">\n")
        renderTags(sb, tags)
        if (hasDiscussion) {
          // only comments whose author is public render
          // (`src/xml_writer.cpp:514-521`); the count above includes all
          // visible ones regardless
          val renderable = comments.filter(_.getAs[String]("author_name") != null)
          if (renderable.isEmpty) sb.append("  <discussion/>\n")
          else {
            sb.append("  <discussion>\n")
            renderable.foreach { c =>
              sb.append("   <comment")
              if (!anon) {
                attrRaw(sb, "uid", c.getAs[Long]("author_id").toString)
                attr(sb, "user", c.getAs[String]("author_name"))
              }
              attrRaw(sb, "date", iso(c.getAs[java.sql.Timestamp]("at")))
              sb.append(">\n    <text>")
              textEsc(c.getAs[String]("body"), sb)
              sb.append("</text>\n   </comment>\n")
            }
            sb.append("  </discussion>\n")
          }
        }
        sb.append(" </changeset>\n")
      }
      sb.toString
    }(Encoders.STRING)
  }

  private def renderTags(sb: java.lang.StringBuilder, tags: scala.collection.Seq[Row]): Unit =
    tags.foreach { t =>
      sb.append("  <tag")
      attr(sb, "k", t.getAs[String]("k"))
      attr(sb, "v", t.getAs[String]("v"))
      sb.append("/>\n")
    }

  /** timestamp/version/changeset[/visible][/user/uid] shared by n/w/r
    * (`src/xml_writer.cpp:364-387`).
    */
  private def commonAttrs(sb: java.lang.StringBuilder, r: Row, anon: Boolean,
                          history: Boolean): Unit = {
    attrRaw(sb, "timestamp", iso(r.getAs[java.sql.Timestamp]("timestamp")))
    attrRaw(sb, "version", r.getAs[Long]("version").toString)
    attrRaw(sb, "changeset", r.getAs[Long]("changeset_id").toString)
    if (history) attrRaw(sb, "visible", if (r.getAs[Boolean]("visible")) "true" else "false")
    val userName = r.getAs[String]("user_name")
    if (!anon && userName != null) {
      attr(sb, "user", userName)
      attrRaw(sb, "uid", r.getAs[Long]("attr_uid").toString)
    }
  }

  def renderNodes(df: DataFrame, anon: Boolean, history: Boolean): Dataset[String] = {
    df.orderBy(col("id"), col("version")).map { r =>
      val sb = new java.lang.StringBuilder(160)
      sb.append(" <node")
      attrRaw(sb, "id", r.getAs[Long]("id").toString)
      val visible = r.getAs[Boolean]("visible")
      if (visible) { // deleted nodes carry no coordinates
        attrRaw(sb, "lat", coord(r.getAs[Int]("latitude")))
        attrRaw(sb, "lon", coord(r.getAs[Int]("longitude")))
      }
      commonAttrs(sb, r, anon, history)
      val tags = if (visible) r.getAs[scala.collection.Seq[Row]]("tags") else Nil
      if (tags.isEmpty) sb.append("/>\n")
      else { sb.append(">\n"); renderTags(sb, tags); sb.append(" </node>\n") }
      sb.toString
    }(Encoders.STRING)
  }

  def renderWays(df: DataFrame, anon: Boolean, history: Boolean): Dataset[String] = {
    df.orderBy(col("id"), col("version")).map { r =>
      val sb = new java.lang.StringBuilder(256)
      sb.append(" <way")
      attrRaw(sb, "id", r.getAs[Long]("id").toString)
      commonAttrs(sb, r, anon, history)
      val visible = r.getAs[Boolean]("visible")
      val nds = if (visible) r.getAs[scala.collection.Seq[Long]]("nds") else Nil
      val tags = if (visible) r.getAs[scala.collection.Seq[Row]]("tags") else Nil
      if (nds.isEmpty && tags.isEmpty) sb.append("/>\n")
      else {
        sb.append(">\n")
        nds.foreach { n => sb.append("  <nd"); attrRaw(sb, "ref", n.toString); sb.append("/>\n") }
        renderTags(sb, tags)
        sb.append(" </way>\n")
      }
      sb.toString
    }(Encoders.STRING)
  }

  def renderRelations(df: DataFrame, anon: Boolean, history: Boolean): Dataset[String] = {
    df.orderBy(col("id"), col("version")).map { r =>
      val sb = new java.lang.StringBuilder(256)
      sb.append(" <relation")
      attrRaw(sb, "id", r.getAs[Long]("id").toString)
      commonAttrs(sb, r, anon, history)
      val visible = r.getAs[Boolean]("visible")
      val members = if (visible) r.getAs[scala.collection.Seq[Row]]("members") else Nil
      val tags = if (visible) r.getAs[scala.collection.Seq[Row]]("tags") else Nil
      if (members.isEmpty && tags.isEmpty) sb.append("/>\n")
      else {
        sb.append(">\n")
        members.foreach { m =>
          sb.append("  <member")
          val t = m.getAs[String]("mtype") match {
            case "Node" => "node"
            case "Way" => "way"
            case _ => "relation"
          }
          attrRaw(sb, "type", t)
          attrRaw(sb, "ref", m.getAs[Long]("mref").toString)
          attr(sb, "role", m.getAs[String]("mrole"))
          sb.append("/>\n")
        }
        renderTags(sb, tags)
        sb.append(" </relation>\n")
      }
      sb.toString
    }(Encoders.STRING)
  }
}
