package graft.osm

import org.scalatest.funsuite.AnyFunSuite

class CopyDecoderSpec extends AnyFunSuite {

  test("parseCopyHeader strips quotes and spaces") {
    assert(CopyDecoder.parseCopyHeader(
      """COPY nodes (node_id, latitude, "timestamp", version) FROM stdin;""") ===
      Seq("node_id", "latitude", "timestamp", "version"))
  }

  test("unescape handles PG COPY escapes") {
    assert(CopyDecoder.unescape("""a\tb\nc""") === "a\tb\nc")
    assert(CopyDecoder.unescape("""back\\slash""") === "back\\slash")
    assert(CopyDecoder.unescape("""\b\f\r\v""") === "\b\f\r")
    assert(CopyDecoder.unescape("""oct\001al""") === "octal")
    assert(CopyDecoder.unescape("""hex\x1Fv""") === "hexv")
    assert(CopyDecoder.unescape("plain") === "plain")
    assert(CopyDecoder.unescape("""unnecessary\qescape""") === "unnecessaryqescape")
  }

  test("timestamp parse truncates fractional seconds, UTC") {
    val ts = CopyDecoder.parseTimestamp("2015-02-16 23:34:53.794498")
    assert(ts.toInstant.toString === "2015-02-16T23:34:53Z")
    val ts2 = CopyDecoder.parseTimestamp("2013-06-20 14:45:07")
    assert(ts2.toInstant.toString === "2013-06-20T14:45:07Z")
  }

  test("decode node row with null redaction and column reorder") {
    val t = Schema.nodes
    val dumpCols = CopyDecoder.parseCopyHeader(
      """COPY nodes (node_id, latitude, longitude, changeset_id, visible, "timestamp", tile, version, redaction_id) FROM stdin;""")
    val idx = CopyDecoder.reorder(t, dumpCols)
    val row = CopyDecoder.decode(t, idx,
      "26032956\t469688169\t95496806\t16630178\tt\t2013-06-20 14:45:07\t3492606168\t5\t\\N")
    assert(row.getLong(0) === 26032956L) // id
    assert(row.getLong(1) === 5L) // version
    assert(row.getLong(2) === 16630178L) // changeset_id
    assert(row.getBoolean(3) === true)
    assert(row.isNullAt(5)) // redaction_id
    assert(row.getInt(6) === 469688169)
    assert(row.getInt(7) === 95496806)
  }

  test("member_role empty trailing field survives") {
    val t = Schema.relationMembers
    val idx = CopyDecoder.reorder(t, CopyDecoder.parseCopyHeader(
      "COPY relation_members (relation_id, member_type, member_id, member_role, version, sequence_id) FROM stdin;"))
    val row = CopyDecoder.decode(t, idx, "8497\tRelation\t149202\t\t55\t1")
    // cols: relation_id, version, sequence_id, member_type, member_id, member_role
    assert(row.getString(5) === "")
    assert(row.getString(3) === "Relation")
  }
}

class XmlFormatSpec extends AnyFunSuite {
  test("control chars replaced with ?") {
    assert(XmlFormat.badChars("ab\tc\nd") === "a?b\tc\nd")
  }
  test("attribute escaping matches libxml2") {
    val sb = new java.lang.StringBuilder
    XmlFormat.attrEsc("a<b>&\"\n\t\rz", sb)
    assert(sb.toString === "a&lt;b&gt;&amp;&quot;&#10;&#9;&#13;z")
  }
  test("text escaping matches libxml2") {
    val sb = new java.lang.StringBuilder
    XmlFormat.textEsc("<!-- & -->\n", sb)
    assert(sb.toString === "&lt;!-- &amp; --&gt;\n")
  }
  test("coordinate fixed-7 formatting") {
    assert(XmlFormat.coord(469688169) === "46.9688169")
    assert(XmlFormat.coord(-900000000) === "-90.0000000")
    assert(XmlFormat.coord(1800000000) === "180.0000000")
    assert(XmlFormat.coord(0) === "0.0000000")
  }
  test("iso time format") {
    assert(XmlFormat.iso(CopyDecoder.parseTimestamp("2015-02-21 10:35:50.886327")) === "2015-02-21T10:35:50Z")
    assert(XmlFormat.iso(null) === "")
  }
}
