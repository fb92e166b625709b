package graft.osm

import java.util.Locale

/** Byte-exact XML formatting helpers replicating the reference's
  * libxml2-based output (`src/xml_writer.cpp`):
  *  - C0 control chars except \t \n \r → '?' before any escaping
  *    (`src/xml_writer.cpp:41-56`);
  *  - attribute values escape & < > " and render \n \r \t as numeric
  *    character references (libxml2 xmlAttrSerializeTxtContent);
  *  - text nodes escape & < > and \r only;
  *  - int coords ÷1e7 printed %.7f; timestamps YYYY-mm-ddTHH:MM:SSZ,
  *    empty string for the missing/neg-infinity case.
  */
object XmlFormat extends Serializable {

  def badChars(s: String): String = {
    var i = 0; val n = s.length
    var found = false
    while (i < n && !found) {
      val c = s.charAt(i)
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') found = true else i += 1
    }
    if (!found) return s
    val a = s.toCharArray
    while (i < n) {
      val c = a(i)
      if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') a(i) = '?'
      i += 1
    }
    new String(a)
  }

  /** Escape for attribute values (after badChars). */
  def attrEsc(raw: String, sb: java.lang.StringBuilder): Unit = {
    val s = badChars(raw)
    var i = 0; val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\n' => sb.append("&#10;")
        case '\r' => sb.append("&#13;")
        case '\t' => sb.append("&#9;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** Escape for element text content (after badChars). */
  def textEsc(raw: String, sb: java.lang.StringBuilder): Unit = {
    val s = badChars(raw)
    var i = 0; val n = s.length
    while (i < n) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '\r' => sb.append("&#13;")
        case c => sb.append(c)
      }
      i += 1
    }
  }

  /** ISO-8601 Zulu, second precision; null → "" (neg-infinity path). */
  def iso(ts: java.sql.Timestamp): String = {
    if (ts == null) return ""
    val epochSec = Math.floorDiv(ts.getTime, 1000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(epochSec, 0, java.time.ZoneOffset.UTC)
    f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${ldt.getDayOfMonth}%02dT${ldt.getHour}%02d:${ldt.getMinute}%02d:${ldt.getSecond}%02dZ"
  }

  /** 1e7-scaled int coordinate → %.7f (exact 7 decimals, never a
    * halfway-rounding case, so Java and C printf agree).
    */
  def coord(i: Int): String = String.format(Locale.ROOT, "%.7f", java.lang.Double.valueOf(i / 1e7))

  def attr(sb: java.lang.StringBuilder, name: String, value: String): Unit = {
    sb.append(' ').append(name).append("=\"")
    attrEsc(value, sb)
    sb.append('"')
  }

  def attrRaw(sb: java.lang.StringBuilder, name: String, value: String): Unit =
    sb.append(' ').append(name).append("=\"").append(value).append('"')

  def header(generator: String, maxTime: Option[java.sql.Timestamp],
             license: String = "http://opendatacommons.org/licenses/odbl/1-0/",
             copyright: String = "OpenStreetMap and contributors",
             attribution: String = "http://www.openstreetmap.org/copyright",
             origin: String = "http://www.openstreetmap.org/api/0.6"): String = {
    val sb = new java.lang.StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n<osm")
    attr(sb, "license", license)
    attr(sb, "copyright", copyright)
    attr(sb, "version", "0.6")
    attr(sb, "generator", generator)
    attr(sb, "attribution", attribution)
    attr(sb, "timestamp", iso(maxTime.orNull))
    sb.append(">\n <bound")
    attr(sb, "box", "-90,-180,90,180")
    attr(sb, "origin", origin)
    sb.append("/>\n")
    sb.toString
  }

  val footer: String = "</osm>\n"
}
