package graft.osm

import org.scalacheck.{Arbitrary, Gen}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests: PG COPY escape/unescape round trip and XML escaping
  * invariants over arbitrary strings (incl. control chars, unicode,
  * backslashes).
  */
class PropertySpec extends AnyFunSuite {

  /** Deterministic sampling driver (the scalatest/scalacheck bridge
    * artifact isn't cached in this environment).
    */
  private def forAll[T](g: Gen[T], n: Int = 300)(f: T => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    val params = Gen.Parameters.default
    (0 until n).foreach { i =>
      g.apply(params.withSize(1 + i % 50), seed).foreach(f)
      seed = seed.next
    }
  }

  /** PostgreSQL text-COPY escaping as COPY TO produces it (the inverse
    * of CopyDecoder.unescape for the escapes PG actually emits).
    */
  private def pgEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\f' => sb.append("\\f")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case '\u000B' => sb.append("\\v")
      case c => sb.append(c)
    }
    sb.toString
  }

  private val anyText: Gen[String] = Gen.frequency(
    5 -> Arbitrary.arbitrary[String],
    3 -> Gen.listOf(Gen.oneOf('\\', '\t', '\n', '\r', '\b', '\f', '\u000B',
      'a', 'ü', '中', ' ', '"', '<', '&')).map(_.mkString),
    1 -> Gen.const(""))

  test("unescape(pgEscape(s)) == s for any string") {
    forAll(anyText) { s =>
      assert(CopyDecoder.unescape(pgEscape(s)) === s)
    }
  }

  test("unescaped text never contains escape artifacts from clean input") {
    forAll(Gen.alphaNumStr) { s =>
      assert(CopyDecoder.unescape(s) === s)
    }
  }

  test("attribute escaping emits no raw specials and is XML-decodable") {
    forAll(anyText) { s =>
      val sb = new java.lang.StringBuilder
      XmlFormat.attrEsc(s, sb)
      val out = sb.toString
      // no raw markup or control chars may survive in attribute values
      assert(!out.contains('<') && !out.contains('"') && !out.contains('>'))
      assert(!out.exists(c => c < 0x20))
      // decoding the five entities yields the bad-char-substituted input
      val decoded = out
        .replace("&#10;", "\n").replace("&#13;", "\r").replace("&#9;", "\t")
        .replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&amp;", "&")
      assert(decoded === XmlFormat.badChars(s))
    }
  }

  test("text escaping preserves non-markup content") {
    forAll(anyText) { s =>
      val sb = new java.lang.StringBuilder
      XmlFormat.textEsc(s, sb)
      val decoded = sb.toString
        .replace("&#13;", "\r")
        .replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
      assert(decoded === XmlFormat.badChars(s))
    }
  }

  test("timestamp parse/format round trip at second precision") {
    val tsGen = Gen.choose(1072915200L, 4102444800L) // 2004..2100, ref validity window
    forAll(tsGen) { epochSec =>
      val iso = XmlFormat.iso(java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(epochSec)))
      val parsed = CopyDecoder.parseTimestamp(iso.replace("T", " ").stripSuffix("Z"))
      assert(Math.floorDiv(parsed.getTime, 1000L) === epochSec)
    }
  }

  test("coord formatting inverts to the exact integer") {
    forAll(Gen.choose(-1800000000, 1800000000)) { i =>
      val s = XmlFormat.coord(i)
      assert(math.round(s.toDouble * 1e7).toInt === i)
      assert(s.matches("-?\\d+\\.\\d{7}"))
    }
  }
}
