"""robots.txt evaluation at corpus scale: per-host rule extraction and
per-URL allow/deny decisions.

A crawl-derived training corpus must honor the publisher's machine-
readable opt-outs. `page_directives` (sources/html_extract.py) handles
the in-page half (robots meta noindex); this module handles the
site-level half: parse every host's robots.txt into `User-agent: *`
rules and judge every page URL by longest-prefix match.

Scope (documented subset of RFC 9309 / Googlebot semantics):
- Only `User-agent: *` groups apply (a training-data pipeline is not a
  named product token). Consecutive `User-agent:` lines STACK onto one
  group, so `User-agent: foo` / `User-agent: *` / `Disallow: /x`
  blocks everyone.
- Rules are LITERAL path prefixes. Rules containing `*` or `$`
  wildcards are excluded from the rule table (the long tail of real
  robots files; a deterministic-regex translation is the seam to close
  if a corpus needs them). An empty `Disallow:` emits no rule
  (historical "allow everything" idiom), as does any value not
  starting with `/`.
- Decision: the matching rule with the LONGEST path wins; a tie
  between Allow and Disallow at equal length breaks to Allow; a URL
  with no matching rule (or no robots.txt at all) is allowed.
- `#` comments, CRLF line endings, and directive-name case are
  normalized away; rule PATHS keep their case (URL paths are
  case-sensitive).

Scale shape: the robots table is hosts-sized (~10^8 rows against 10^12
pages) and each document is a few hundred lines, so the line explode +
two same-partitioning windows (group tracking) cost one hosts-sized
shuffle. Decisions join pages to rules on the SURT host key — an
equi-join with a post-filter prefix test, then one per-URL window to
pick the winner. Everything is native Catalyst: no UDF touches a line.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzycat_spark.functions.urls import surt_host

__all__ = [
    "robots_rules",
    "robots_decisions",
    "robots_sitemaps",
    "robots_crawl_delays",
    "url_path_col",
]

# group 1 = the path part of a URL (same pattern family as functions/urls)
_PATH_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*([^?#]*)"

UA_RE = r"(?i)^user-agent\s*:\s*(\S+)"
SITEMAP_RE = r"(?i)^sitemap\s*:\s*(\S+)"
CRAWL_DELAY_RE = r"(?i)^crawl-delay\s*:\s*(\S+)"
DIRECTIVE_RE = r"(?i)^(allow|disallow)\s*:"
RULE_PATH_RE = r"(?i)^(?:allow|disallow)\s*:\s*(\S+)"


def _clean_line(raw: Column | str) -> Column:
    """Shared robots.txt line normalization: drop \\r (CRLF), strip
    `#` comments, trim — one definition so `robots_rules` and
    `robots_sitemaps` can never diverge."""
    c = F.col(raw) if isinstance(raw, str) else raw
    return F.trim(F.regexp_replace(F.regexp_replace(c, "\r", ""), "#.*$", ""))


def url_path_col(col: Column | str) -> Column:
    """Path of a URL column for robots matching; empty path -> '/'."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.regexp_extract(F.trim(c), _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def _star_grouped(
    robots: DataFrame, host_col: str, text_col: str
) -> tuple[DataFrame, DataFrame]:
    """Shared group machinery: normalized lines with their UA-group id
    (`grouped`: host, pos, line, ua, directive, path, gid) and the set
    of `User-agent: *` groups (`star_groups`: host, gid) — one
    definition behind `robots_rules` and `robots_crawl_delays`."""
    lines = robots.select(
        surt_host(F.col(host_col)).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "raw"),
    )
    clean = _clean_line("raw")
    lines = lines.select(
        "host",
        "pos",
        clean.alias("line"),
        F.lower(F.regexp_extract(clean, UA_RE, 1)).alias("ua"),
        F.lower(F.regexp_extract(clean, DIRECTIVE_RE, 1)).alias("directive"),
        F.regexp_extract(clean, RULE_PATH_RE, 1).alias("path"),
    )
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("ua") != ""
    # consecutive User-agent lines stack into ONE group: a group starts
    # at a UA line whose predecessor is NOT a UA line
    block_start = is_ua & ~F.lag(is_ua, 1, False).over(w)
    grouped = lines.withColumn(
        "gid",
        F.sum(block_start.cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    star_groups = (
        grouped.filter(is_ua & (F.col("ua") == "*"))
        .select("host", "gid")
        .distinct()
    )
    return grouped, star_groups


def robots_rules(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, path, allow, specificity) literal-prefix rules from every
    `User-agent: *` group — see the module docstring for the exact
    subset. `host` is the SURT host key (so it co-keys with
    `robots_decisions`' page side); `specificity` = length(path), the
    longest-match ranking key, precomputed once here instead of per
    page-rule pair."""
    grouped, star_groups = _star_grouped(robots, host_col, text_col)
    return (
        grouped.filter(
            (F.col("directive") != "")
            & (F.col("gid") > 0)  # rules before any UA line are invalid
            & F.col("path").startswith("/")
            & ~F.col("path").contains("*")
            & ~F.col("path").contains("$")
        )
        .join(star_groups, on=["host", "gid"], how="left_semi")
        .select(
            "host",
            "path",
            (F.col("directive") == "allow").alias("allow"),
            F.length("path").cast("long").alias("specificity"),
        )
        .distinct()
    )


def robots_decisions(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """(url, allowed, rule_path) for every page: longest-prefix match
    against `robots_rules` output, Allow winning length ties,
    default-allow when nothing matches (including hosts with no
    robots.txt). `rule_path` is the winning rule's path, NULL for the
    default-allow case — keep it: at audit time "allowed because no
    rule" and "allowed because Allow: /x" are different facts."""
    p = pages.select(
        F.col(url_col).alias("url"),
        surt_host(F.col(url_col)).alias("host"),
        url_path_col(F.col(url_col)).alias("_path"),
    )
    r = rules.select(
        F.col("host").alias("_rhost"),
        F.col("path").alias("rule_path"),
        "allow",
        "specificity",
    )
    matched = p.join(
        r,
        on=(p["host"] == r["_rhost"])
        & p["_path"].startswith(r["rule_path"]),
        how="inner",
    ).select("url", "rule_path", "allow", "specificity")
    w = Window.partitionBy("url").orderBy(
        F.desc("specificity"), F.desc("allow"), F.asc("rule_path")
    )
    winner = (
        matched.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("url", "rule_path", F.col("allow").alias("_allow"))
    )
    return (
        p.select("url")
        .join(winner, on="url", how="left")
        .select(
            "url",
            F.coalesce("_allow", F.lit(True)).alias("allowed"),
            "rule_path",
        )
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, sitemap_url) — the `Sitemap:` declarations robots.txt
    carries for the crawler's frontier (the discovery input of
    operators/sitemap.py). Per RFC 9309 / sitemaps.org these lines are
    GROUP-INDEPENDENT: they count wherever they appear, including before
    any User-agent line, so no group tracking is needed — one line
    explode, one extract, distinct. Only absolute http(s) URLs are kept
    (the protocol requires absolute locations; a relative value is a
    publisher bug we drop deterministically). Same comment/CRLF
    normalization as `robots_rules` — which means a `#fragment` inside a
    declared URL is treated as a comment, exactly as the rule parser
    would treat it (fragments are meaningless in sitemap URLs anyway).

    Scale: hosts-sized input, one projection + one distinct; the output
    joins `sitemap_entries` on sitemap_url or feeds the fetch frontier."""
    lines = robots.select(
        surt_host(F.col(host_col)).alias("host"),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    )
    return (
        lines.select(
            "host",
            F.regexp_extract(_clean_line("raw"), SITEMAP_RE, 1).alias(
                "sitemap_url"
            ),
        )
        .filter(F.col("sitemap_url").rlike("^(?i)https?://"))
        .distinct()
    )


def robots_crawl_delays(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay) — the `Crawl-delay:` politeness hint from each
    host's `User-agent: *` groups. Unlike `Sitemap:` this directive is
    GROUP-DEPENDENT: a delay inside a named-bot group does not apply to
    us, exactly like its Allow/Disallow siblings (same gid machinery as
    `robots_rules`, so pre-UA lines are invalid too). Non-numeric values
    drop via try-cast; several `*`-group declarations take the MIN
    (most conservative politeness, deterministic). Hosts with no valid
    declaration are absent — the fetcher's default applies."""
    grouped, star_groups = _star_grouped(robots, host_col, text_col)
    delays = (
        grouped.withColumn(
            "_delay",
            F.regexp_extract("line", CRAWL_DELAY_RE, 1).try_cast("double"),
        )
        .filter(F.col("_delay").isNotNull() & (F.col("gid") > 0))
        .join(star_groups, on=["host", "gid"], how="left_semi")
    )
    return delays.groupBy("host").agg(F.min("_delay").alias("crawl_delay"))
