package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** robots.txt evaluation (RFC 9309 core), relational — the crawl-side
  * politeness filter that sits between the URL frontier and the
  * fetcher, and the provenance question a crawl consumer asks
  * backwards ("was this URL even allowed when fetched?").
  *
  * Everything is one narrow parse pass per robots file plus a
  * host-keyed join to the URL set — the robots table is a DIMENSION
  * (one row per host), so the join broadcasts and no shuffle touches
  * the URL stream until the per-URL winner window (keyed by URL —
  * at most |rules-per-host| rows per URL enter it).
  *
  * Contract (RFC 9309, with the simplifications named):
  *
  *   - lines are `key: value` with `#` comments stripped; keys
  *     matched case-insensitively; unknown keys ignored
  *   - a GROUP is one or more consecutive `User-agent` lines followed
  *     by its rules; rules before any `User-agent` line are ignored
  *     (RFC: they belong to no group)
  *   - group selection (RFC 9309 §2.2.1, all three tiers): among
  *     groups whose user-agent value is a case-insensitive PREFIX of
  *     the crawler's product token, those with the LONGEST value win
  *     (an exact match is the longest possible prefix — `graftbot`
  *     beats `graft`; `graftbot-news` is NOT a prefix of `graftbot`
  *     and never matches it); if no prefix matches, all `*` groups;
  *     ties at the winning length are combined, per the RFC
  *   - path patterns: literal octets with `*` (any run) and a final
  *     `$` (end anchor); regex metacharacters in paths are literal
  *   - decision per URL: match patterns against path+query; the
  *     LONGEST pattern wins, `allow` beats `disallow` on equal
  *     length; no matching rule (or no robots entry, or an empty
  *     `Disallow:`) → allowed
  *   - `Crawl-delay` (the de-facto extension) is parsed as a group
  *     member — it terminates a user-agent run like any rule, per the
  *     RFC grammar — and surfaced by [[crawlDelay]] under the same
  *     group selection; `Sitemap:` is file-wide and belongs to
  *     [[Sitemaps.declarations]]
  *
  * Each input ROW is parsed and selected independently (keyed by a
  * CONTENT-derived per-row id, not by host), so duplicate host rows —
  * a data error, but one a crawl log can contain — yield the
  * deterministic UNION of each body's selected rules instead of
  * interleaving lines across bodies. Rows with IDENTICAL (host, body)
  * collapse to one before parsing (they parse identically; the union
  * of identical rule sets is the set). Hosts are normalized to
  * lowercase on both sides of the family (RFC 3986: the authority is
  * case-insensitive) — [[allowed]] lowercases the URL-extracted host
  * to match.
  */
object Robots {

  /** Sanity ceiling on `Crawl-delay` (seconds). Real crawlers cap the
    * field (a >1 h delay is a de-facto disallow); the cap also keeps
    * `fetch_at = t0 + seq × delay` overflow-free for any horizon
    * [[Frontier.fetchSchedule]] can schedule (r11 ADVICE finding:
    * a pathological `Crawl-delay: 9999999999999999` must not become a
    * 317-year spacing that overflows long under multiplication).
    */
  val MaxCrawlDelaySeconds: Int = 3600

  /** Effective rule set for `agent`: one row per (host, rule) in the
    * selected group(s) — (host, rule ∈ allow|disallow, path, pattern)
    * where `pattern` is the anchored regex the path compiles to.
    */
  def directives(robots: DataFrame, hostCol: String, body: Column,
                 agent: String): DataFrame =
    selectedMembers(robots, hostCol, body, agent)
      .filter(col("__key").isin("allow", "disallow"))
      .select(col("host"), col("__key").as("rule"), col("__val").as("path"),
        pathPattern(col("__val")).as("pattern"))

  /** Effective `Crawl-delay` for `agent` (the de-facto extension
    * RFC 9309 §2.2.4 files under "other records"; Bing/Yandex honor
    * it): group-scoped like allow/disallow and selected by the SAME
    * three-tier group selection; when several selected groups (or
    * repeated lines) declare it, the MAX — most conservative — wins.
    * Seconds may be fractional; returned as exact DECIMAL millis
    * (never double), clamped to [[MaxCrawlDelaySeconds]] (values past
    * the cap — including digit runs too long to cast — clamp, never
    * overflow). Non-numeric values are ignored; hosts whose selected
    * groups declare none are absent.
    *
    * Returns (host, crawl_delay_ms: long).
    */
  def crawlDelay(robots: DataFrame, hostCol: String, body: Column,
                 agent: String): DataFrame = {
    // a 13+-digit run is ≥ 10^9 s even with a ".xxx" tail — past the
    // cap without needing the cast (which could overflow decimal(18,3))
    val secs = when(length(col("__val")) <= 12,
      col("__val").cast("decimal(18,3)"))
      .otherwise(lit(MaxCrawlDelaySeconds))
    selectedMembers(robots, hostCol, body, agent)
      .filter(col("__key") === "crawl-delay" &&
        col("__val").rlike("^\\d+(\\.\\d+)?$"))
      .select(col("host"),
        (least(secs, lit(MaxCrawlDelaySeconds)) * 1000)
          .cast("long").as("__ms"))
      .groupBy("host").agg(max("__ms").as("crawl_delay_ms"))
  }

  /** The shared parse/group/select funnel: every group-MEMBER line
    * (allow, disallow, crawl-delay — anything but user-agent) of the
    * group(s) selected for `agent`, as (host, __rid, __grp, __key,
    * __val). [[directives]] and [[crawlDelay]] are projections of
    * this one frame, so grouping and tier selection cannot diverge
    * between them.
    */
  private def selectedMembers(robots: DataFrame, hostCol: String,
                              body: Column, agent: String): DataFrame = {
    val token = agent.toLowerCase
    // The row key is CONTENT-derived (xxhash64 over host+body after an
    // identical-row collapse), not monotonically_increasing_id: the
    // funnel self-joins this lineage three-plus times (agents, members,
    // best), and a positional id would silently mispair groups across
    // branches if the upstream scan were nondeterministic (r11 verdict
    // hardening). Distinct (host, body) pairs colliding in 64 bits is
    // the documented assumption.
    val lines = robots
      .select(lower(col(hostCol)).as("host"), body.as("__body"))
      .distinct()
      .withColumn("__rid", xxhash64(col("host"), col("__body")))
      // RFC 9309 §2.1: lines are delimited by CR, LF, or CR/LF — a
      // CRLF body must not leave \r glued to rule paths (Spark's trim
      // strips 0x20 only); §2.3: the file is UTF-8, so a leading BOM
      // is encoding machinery, not the first line's first character
      .select(col("host"), col("__rid"),
        posexplode(split(regexp_replace(col("__body"), "^\\uFEFF", ""),
          "\r\n|\r|\n")).as(Seq("__pos", "__line")))
    val kv = lines.select(col("host"), col("__rid"), col("__pos"),
      lower(trim(regexp_extract(regexp_replace(col("__line"), "#.*", ""),
        "^\\s*([A-Za-z-]+)\\s*:", 1))).as("__key"),
      trim(regexp_extract(regexp_replace(col("__line"), "#.*", ""),
        "^\\s*[A-Za-z-]+\\s*:(.*)$", 1)).as("__val"))
      // crawl-delay participates in PARSING (a group-member line ends
      // a user-agent run, per the RFC grammar) even though directives
      // itself only emits allow/disallow rules — [[crawlDelay]] reads
      // the same funnel
      .filter(col("__key").isin("user-agent", "allow", "disallow",
        "crawl-delay"))
    // group id = count of ua-run STARTS so far (consecutive ua lines
    // share a group); a per-input-row window over line position —
    // robots files are KB-sized, the window partitions by row id
    val w = Window.partitionBy("__rid").orderBy("__pos")
    val isUa = col("__key") === "user-agent"
    val grouped = kv
      .withColumn("__ua", isUa)
      .withColumn("__start",
        when(isUa && !coalesce(lag(isUa, 1).over(w), lit(false)), 1L)
          .otherwise(0L))
      .withColumn("__grp", sum(col("__start")).over(w))
      .filter(col("__grp") >= 1) // pre-group rules belong to no group
    val agents = grouped.filter(col("__ua"))
      .select(col("host"), col("__rid"), col("__grp"),
        lower(col("__val")).as("__agent"))
    val members = grouped.filter(!col("__ua") && col("__val") =!= "")
      .select(col("host"), col("__rid"), col("__grp"),
        col("__key"), col("__val"))
    // RFC 9309 group selection: groups whose agent value is a prefix
    // of the product token, longest value wins; else the * groups.
    // An empty user-agent value (malformed line) is a prefix of
    // everything by string semantics — excluded explicitly.
    val matched = agents
      .filter(col("__agent") =!= "" && lit(token).startsWith(col("__agent")))
    val best = matched.groupBy("__rid")
      .agg(max(length(col("__agent"))).as("__blen"))
    val selPrefix = matched.join(best, Seq("__rid"))
      .filter(length(col("__agent")) === col("__blen"))
      .select("__rid", "__grp").distinct()
    val selStar = agents.filter(col("__agent") === "*")
      .join(best, Seq("__rid"), "left_anti")
      .select("__rid", "__grp").distinct()
    members.join(selPrefix.unionByName(selStar), Seq("__rid", "__grp"),
      "left_semi")
  }

  /** The anchored regex a robots path compiles to: escape regex
    * metacharacters, then `*` → `.*` and one FINAL `$` → end anchor.
    */
  private def pathPattern(path: Column): Column = {
    val escaped = regexp_replace(path,
      "([.\\\\+?*()\\[\\]{}|^$])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\\\\\*", ".*")
    concat(lit("^"), regexp_replace(wild, "\\\\\\$$", "\\$"))
  }

  /** Per-URL verdict against the effective rules for `agent`:
    * (idCol, url, host, allowed, rule, rule_path) — `rule`/`rule_path`
    * are the winning directive (null when nothing matched). URLs on
    * hosts without robots data are allowed.
    */
  def allowed(urls: DataFrame, idCol: String, url: Column,
              robots: DataFrame, hostCol: String, body: Column,
              agent: String = "graftbot"): DataFrame = {
    val dirs = directives(robots, hostCol, body, agent)
    // scheme matched case-insensitively, host lowercased (RFC 3986:
    // scheme and authority are case-insensitive) so `HTTP://HOST/x`
    // meets the dimension's lowercase host key
    val u = urls.select(col(idCol), url.as("url"),
      lower(regexp_extract(url, "(?i)^https?://([^/?#]+)", 1)).as("host"),
      // decision path = path+query; bare origin evaluates as "/"
      when(regexp_extract(url, "(?i)^https?://[^/?#]+([^#]*)", 1) === "", "/")
        .otherwise(regexp_extract(url, "(?i)^https?://[^/?#]+([^#]*)", 1))
        .as("__path"))
    // memo_rlike, not regexp_like: after the URL×rules broadcast join
    // the pattern column changes nearly every row, defeating RLike's
    // last-pattern cache — the URL stream would pay a Pattern.compile
    // per row (r11 verdict finding #1)
    val hits = u.join(broadcast(dirs), Seq("host"), "left_outer")
      .withColumn("__m", col("pattern").isNotNull &&
        graft.plans.MemoRLike.matches(col("__path"), col("pattern")))
    // longest pattern wins; allow beats disallow on ties; path text as
    // the final tiebreak so the winner is deterministic on any engine
    val w = Window.partitionBy(col(idCol)).orderBy(
      when(col("__m"), length(col("path"))).otherwise(-1).desc,
      when(col("rule") === "allow", 1).otherwise(0).desc,
      col("path").asc_nulls_last)
    hits.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("url"), col("host"),
        (!col("__m") || col("rule") === "allow").as("allowed"),
        when(col("__m"), col("rule")).as("rule"),
        when(col("__m"), col("path")).as("rule_path"))
  }
}
