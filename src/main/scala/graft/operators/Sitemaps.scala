package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap support (sitemaps.org protocol + the `Sitemap:` robots.txt
  * extension RFC 9309 acknowledges) — the third leg of the crawl
  * politeness/discovery family next to [[Robots]] (what may be
  * fetched) and [[WebGraph]] (what was found by links): sitemaps are
  * what the SITE ITSELF asks to have crawled, the seed list a frontier
  * merges with link discovery.
  *
  * Both operators are the same engine-portable discipline as the WAT
  * family: codegen'd RE2-compatible regexes over the payload, one
  * narrow pass per document, no shuffle until the caller aggregates —
  * so the DuckDB oracle replays byte-identical extraction.
  *
  * XML-lite contract (documented over exotic, like the HTML side):
  * element syntax only — `<loc>`, `<lastmod>`, `<changefreq>`,
  * `<priority>` inside `<url>`/`<sitemap>` blocks, case-insensitive,
  * whitespace-trimmed; CDATA and XML comments are out of scope; the
  * five standard XML entities are decoded in `loc` (the spec REQUIRES
  * URLs be entity-escaped).
  */
object Sitemaps {

  /** `Sitemap:` declarations from robots.txt bodies. Per the spec the
    * field is NOT group-scoped — it applies file-wide, may appear
    * anywhere (before any group included — where allow/disallow lines
    * would be dead), and may repeat. Same line grammar as the rule
    * parse ([[Robots.directives]]): `#` comments stripped, key
    * case-insensitive, value trimmed; empty values dropped. The host
    * is lowercased like everywhere in the politeness family
    * (RFC 3986: the authority is case-insensitive).
    *
    * Returns (host, sitemap_url), one row per declaration.
    */
  def declarations(robots: DataFrame, hostCol: String,
                   body: Column): DataFrame =
    robots.select(lower(col(hostCol)).as("host"),
        explode(split(body, "\n")).as("__line"))
      .select(col("host"),
        lower(trim(regexp_extract(regexp_replace(col("__line"), "#.*", ""),
          "^\\s*([A-Za-z-]+)\\s*:", 1))).as("__key"),
        trim(regexp_extract(regexp_replace(col("__line"), "#.*", ""),
          "^\\s*[A-Za-z-]+\\s*:(.*)$", 1)).as("__val"))
      .filter(col("__key") === "sitemap" && col("__val") =!= "")
      .select(col("host"), col("__val").as("sitemap_url"))

  /** One `<url>`/`<sitemap>` block, either kind — RE2-safe alternation
    * (a backreference `<(url|sitemap)>.*?</\1>` would not be).
    */
  val BlockPattern: String =
    "(?is)<url\\s*>.*?</url\\s*>|<sitemap\\s*>.*?</sitemap\\s*>"

  private def field(block: Column, name: String): Column =
    trim(regexp_extract(block,
      s"(?is)<$name\\s*>(.*?)</$name\\s*>", 1))

  /** Decode the five standard XML entities (amp LAST so `&amp;lt;`
    * decodes to the literal `&lt;`, not `<`).
    */
  private def xmlUnescape(c: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&amp;" -> "&")
    steps.foldLeft(c) { case (acc, (e, ch)) => replace(acc, lit(e), lit(ch)) }
  }

  /** Parse sitemap documents — urlset pages and sitemapindex pages in
    * one pass (an index's `<sitemap>` entries are the recursion edge a
    * fetch loop follows; `from_index` marks them).
    *
    * Returns (idCol, entry_no, loc, lastmod, changefreq,
    * priority_milli, from_index) — `entry_no` the 1-based block
    * position in document order, `loc` entity-decoded and trimmed
    * (empty → the row is DROPPED: an entry without a location is
    * meaningless), `lastmod`/`changefreq` trimmed strings ("" when
    * absent — the W3C datetime grammar is the consumer's parse),
    * `priority_milli` the exact decimal promille (null when absent;
    * DECIMAL arithmetic, not double — engine-portable), `from_index`
    * whether the block is a `<sitemap>` index entry.
    */
  /** `lastmod`'s W3C datetime grammar (the subset sitemaps.org names)
    * as typed epoch millis — the parse [[entries]] deliberately leaves
    * to the consumer, here AS the consumer (recrawl-due needs a typed
    * column; r11 verdict gap #2). Forms:
    *
    *   - `YYYY`, `YYYY-MM`, `YYYY-MM-DD` — date precision, midnight
    *     UTC of the period's first instant
    *   - `YYYY-MM-DDThh:mmTZD`, `Thh:mm:ssTZD`, `Thh:mm:ss.sTZD` —
    *     time precision; TZD = `Z` or `±hh:mm` (mandatory per the
    *     grammar)
    *
    * Every form is NORMALIZED to one full ISO-8601 instant string and
    * parsed by a single `try_to_timestamp` — both engines cast the
    * SAME normalized text, so the parse is engine-portable by
    * construction; anything outside the grammar (or a semantically
    * invalid date like `2024-13-45`) yields null, never an error.
    */
  def lastmodMillis(lastmod: Column): Column = {
    val t = trim(lastmod)
    val tzd = "(Z|[+-]\\d{2}:\\d{2})"
    val norm = when(t.rlike("^\\d{4}$"), concat(t, lit("-01-01T00:00:00Z")))
      .when(t.rlike("^\\d{4}-\\d{2}$"), concat(t, lit("-01T00:00:00Z")))
      .when(t.rlike("^\\d{4}-\\d{2}-\\d{2}$"), concat(t, lit("T00:00:00Z")))
      .when(t.rlike(s"^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}$tzd$$"),
        concat(substring(t, 1, 16), lit(":00"),
          regexp_extract(t, s"$tzd$$", 1)))
      .when(t.rlike(s"^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?$tzd$$"),
        t)
    unix_millis(try_to_timestamp(norm))
  }

  /** Recrawl due time: `lastmod + period(changefreq)` — the
    * composition the two fields exist for (when should a polite
    * crawler come back?). Period convention (documented over exotic:
    * the spec calls the field "a hint", so fixed periods are the
    * portable reading): always → 0 (due immediately at lastmod),
    * hourly/daily/weekly → exact, monthly → 30 days, yearly → 365
    * days, `never`/absent/unknown → null (no time-based recrawl).
    * Null lastmod → null. Millis in, millis out — feeds
    * [[graft.operators.Frontier.fetchSchedule]]'s time axis directly.
    */
  def recrawlDueMillis(lastmodMs: Column, changefreq: Column): Column = {
    val f = lower(trim(changefreq))
    val period = when(f === "always", lit(0L))
      .when(f === "hourly", lit(3600000L))
      .when(f === "daily", lit(86400000L))
      .when(f === "weekly", lit(604800000L))
      .when(f === "monthly", lit(2592000000L))
      .when(f === "yearly", lit(31536000000L))
    lastmodMs + period
  }

  def entries(df: DataFrame, idCol: String, xml: Column): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(xml, lit(BlockPattern), lit(0)))
          .as(Seq("__pos", "__blk")))
      .select(col(idCol),
        (col("__pos") + 1).cast("long").as("entry_no"),
        xmlUnescape(field(col("__blk"), "loc")).as("loc"),
        field(col("__blk"), "lastmod").as("lastmod"),
        field(col("__blk"), "changefreq").as("changefreq"),
        when(field(col("__blk"), "priority") =!= "",
          (field(col("__blk"), "priority").cast("decimal(10,3)") * 1000)
            .cast("long")).as("priority_milli"),
        col("__blk").rlike("(?is)^<sitemap\\s*>").as("from_index"))
      .filter(col("loc") =!= "")
}
