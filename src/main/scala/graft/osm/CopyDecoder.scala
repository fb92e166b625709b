package graft.osm

import java.time.{LocalDateTime, ZoneOffset}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** PostgreSQL text-COPY row decoder.
  *
  * Semantics match the reference (`include/unescape_copy_row.hpp`):
  *  - fields are tab-separated; `\N` (checked BEFORE unescaping) is NULL;
  *  - escapes: \b \f \n \r \t \v \\, 3-digit octal, \xHH; any other
  *    escaped char is taken literally;
  *  - bool is first-char 't'/'f';
  *  - timestamps are `YYYY-MM-DD HH:MM:SS[.ffffff]` with the fractional
  *    part TRUNCATED (not rounded), interpreted as UTC;
  *  - consumed columns are located by name in the COPY header (dump
  *    column order is not assumed); `*` means positional column 0.
  *
  * Pure Scala, serializable, used inside `Dataset.map` on executors.
  */
object CopyDecoder extends Serializable {

  /** Parse `COPY <table> (col, "col2", ...) FROM stdin;` → column names. */
  def parseCopyHeader(line: String): Seq[String] = {
    val open = line.indexOf('(')
    val close = line.lastIndexOf(')')
    require(open > 0 && close > open, s"not a COPY header: $line")
    line.substring(open + 1, close).split(",").toSeq
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  /** Resolve each consumed column to its index in the dump row. */
  def reorder(table: Schema.Table, dumpCols: Seq[String]): Array[Int] =
    table.cols.zipWithIndex.map { case (c, i) =>
      if (c.dumpName == "*") 0
      else {
        val j = dumpCols.indexOf(c.dumpName)
        require(j >= 0, s"column ${c.dumpName} not in dump header $dumpCols for ${table.name}")
        j
      }
    }.toArray

  /** True for data rows (all consumed tables have ≥3 columns, so every
    * data row contains a tab; none of pg_restore's non-data lines do).
    */
  def isDataLine(line: String): Boolean = line.indexOf('\t') >= 0

  def unescape(s: String): String = {
    var i = s.indexOf('\\')
    if (i < 0) return s
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    sb.append(s, 0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        val e = s.charAt(i + 1)
        e match {
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'v' => sb.append('\u000b'); i += 2
          case 'x' if isHex(s, i + 2) => // \xH[H]
            if (isHex(s, i + 3)) {
              sb.append((hex(s.charAt(i + 2)) * 16 + hex(s.charAt(i + 3))).toChar); i += 4
            } else { sb.append(hex(s.charAt(i + 2)).toChar); i += 3 }
          case d if d >= '0' && d <= '7' =>
            var v = d - '0'; var j = i + 2; var k = 1
            while (k < 3 && j < n && s.charAt(j) >= '0' && s.charAt(j) <= '7') {
              v = v * 8 + (s.charAt(j) - '0'); j += 1; k += 1
            }
            sb.append(v.toChar); i = j
          case other => sb.append(other); i += 2 // unnecessary escape
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(s: String, i: Int): Boolean = i < s.length && isHexDigit(s.charAt(i))
  private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
  private def hex(c: Char): Int =
    if (c <= '9') c - '0' else if (c >= 'a') 10 + (c - 'a') else 10 + (c - 'A')

  /** `YYYY-MM-DD HH:MM:SS[.ffffff]` (UTC) with fraction truncated. */
  def parseTimestamp(s: String): java.sql.Timestamp = {
    require(s.length >= 19, s"unexpected timestamp format: `$s`")
    def d2(i: Int) = (s.charAt(i) - '0') * 10 + (s.charAt(i + 1) - '0')
    val year = (s.charAt(0) - '0') * 1000 + (s.charAt(1) - '0') * 100 + d2(2)
    val ldt = LocalDateTime.of(year, d2(5), d2(8), d2(11), d2(14), d2(17))
    java.sql.Timestamp.from(ldt.toInstant(ZoneOffset.UTC))
  }

  /** Build a reusable line→Row parser for `table` with the column
    * reorder `idx`: per-column type dispatch and list indexing resolve
    * ONCE here, not per cell — this is the hottest loop of the load
    * phase (rows × columns at planet scale).
    */
  def rowParser(table: Schema.Table, idx: Array[Int]): String => Row = {
    val parsers: Array[String => Any] = table.cols.map { c =>
      val base: String => Any = c.dt match {
        case LongType => r => java.lang.Long.parseLong(unescape(r))
        case IntegerType => r => java.lang.Integer.parseInt(unescape(r))
        case BooleanType => r => r.charAt(0) match {
          case 't' => java.lang.Boolean.TRUE
          case 'f' => java.lang.Boolean.FALSE
          case _ => throw new IllegalArgumentException(s"bad bool `$r`")
        }
        case StringType => r => unescape(r)
        case TimestampType => r => parseTimestamp(unescape(r))
        case DoubleType => r => java.lang.Double.parseDouble(unescape(r))
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
      if (c.nullable) { r: String => if (r == "\\N") null else base(r) } else base
    }.toArray
    val reorder = idx
    line => {
      val raw = splitTabs(line)
      val vals = new Array[Any](reorder.length)
      var i = 0
      while (i < reorder.length) {
        vals(i) = parsers(i)(raw(reorder(i)))
        i += 1
      }
      Row.fromSeq(vals.toSeq)
    }
  }

  /** One-off decode (tests / single rows); hot paths use [[rowParser]]. */
  def decode(table: Schema.Table, idx: Array[Int], line: String): Row =
    rowParser(table, idx)(line)

  /** Tab split that keeps empty trailing fields (member_role is often ""). */
  private def splitTabs(line: String): Array[String] = line.split("\t", -1)
}
