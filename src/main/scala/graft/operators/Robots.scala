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
  *
  * Each input ROW is parsed and selected independently (keyed by a
  * per-row id, not by host), so duplicate host rows — a data error,
  * but one a crawl log can contain — yield the deterministic UNION of
  * each body's selected rules instead of interleaving lines across
  * bodies.
  */
object Robots {

  /** Effective rule set for `agent`: one row per (host, rule) in the
    * selected group(s) — (host, rule ∈ allow|disallow, path, pattern)
    * where `pattern` is the anchored regex the path compiles to.
    */
  def directives(robots: DataFrame, hostCol: String, body: Column,
                 agent: String): DataFrame = {
    val token = agent.toLowerCase
    val lines = robots
      .select(col(hostCol).as("host"), body.as("__body"))
      .withColumn("__rid", monotonically_increasing_id())
      .select(col("host"), col("__rid"),
        posexplode(split(col("__body"), "\n")).as(Seq("__pos", "__line")))
    val kv = lines.select(col("host"), col("__rid"), col("__pos"),
      lower(trim(regexp_extract(regexp_replace(col("__line"), "#.*", ""),
        "^\\s*([A-Za-z-]+)\\s*:", 1))).as("__key"),
      trim(regexp_extract(regexp_replace(col("__line"), "#.*", ""),
        "^\\s*[A-Za-z-]+\\s*:(.*)$", 1)).as("__val"))
      .filter(col("__key").isin("user-agent", "allow", "disallow"))
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
    val rules = grouped.filter(!col("__ua") && col("__val") =!= "")
      .select(col("host"), col("__rid"), col("__grp"),
        col("__key").as("rule"), col("__val").as("path"))
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
    rules.join(selPrefix.unionByName(selStar), Seq("__rid", "__grp"),
        "left_semi")
      .select(col("host"), col("rule"), col("path"),
        pathPattern(col("path")).as("pattern"))
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
    val u = urls.select(col(idCol), url.as("url"),
      regexp_extract(url, "^https?://([^/?#]+)", 1).as("host"),
      // decision path = path+query; bare origin evaluates as "/"
      when(regexp_extract(url, "^https?://[^/?#]+([^#]*)", 1) === "", "/")
        .otherwise(regexp_extract(url, "^https?://[^/?#]+([^#]*)", 1))
        .as("__path"))
    val hits = u.join(broadcast(dirs), Seq("host"), "left_outer")
      .withColumn("__m", col("pattern").isNotNull &&
        regexp_like(col("__path"), col("pattern")))
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
