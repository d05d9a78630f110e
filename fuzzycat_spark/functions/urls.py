"""URL canonicalization — SURT-style keys for URL-level dedup.

The first dedup pass over a web crawl is free: pages fetched from the
same resource under cosmetically different URLs (scheme, www, default
port, tracking params, fragments, index pages, trailing slashes) are
exact duplicates before any text ever loads. Web archives canonicalize
with SURT (Sort-friendly URI Reordering Transform): host labels
reversed and comma-joined, so `https://www.example.com/a?b=1` becomes
`com,example)/a?b=1`. SURT keys sort hierarchically by registered
domain, which at cluster scale means a range-partition or bucket on the
key co-locates each site's pages — per-site caps, robots joins, and
host-level stats all become shuffle-free follow-ups.

Everything here is pure Catalyst (regexp_extract + array ops over the
query string), identical Java-regex/RE2-safe patterns on both engines:
no lookbehind, no backreferences. Normalizations applied:

- scheme dropped (http/https/ftp duplicates collapse), fragment dropped;
- host lowercased, leading `www.` stripped, default ports (:80, :443)
  stripped, labels reversed: `a.b.com` -> `com,b,a`;
- path: trailing `/index.html|htm|php` stripped, then trailing slashes
  stripped (root collapses to empty — `com,example)/` vs `com,example)`
  is the same resource);
- query: split on `&`, tracking params dropped (utm_*, fbclid, gclid,
  msclkid, igshid, mc_cid, mc_eid, ref, ref_src), remaining params
  SORTED bytewise and rejoined, empty query dropped.

Not a validator: garbage in, deterministic garbage key out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["surt_host", "surt_key", "url_dup_pairs", "TRACKING_PARAM_RE"]

# one pattern per URL part — group 1 is always the payload
_HOST_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?([^/?#]*)"
_PATH_RE = r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^?#]*\?([^#]*)"

TRACKING_PARAM_RE = (
    r"^(utm_[^=]*|fbclid|gclid|msclkid|igshid|mc_cid|mc_eid|ref|ref_src)(=.*)?$"
)


def surt_host(col: Column | str) -> Column:
    """Reversed-label canonical host of a URL column: lowercased, www.
    and default ports stripped, labels joined with commas
    (`news.example.co.uk` -> `uk,co,example,news`)."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.lower(F.regexp_extract(F.trim(c), _HOST_RE, 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    # a surviving non-default port belongs AFTER the reversed labels
    # (com,example:8080), not riding the last label through the reversal
    port = F.regexp_extract(host, r"(:\d+)$", 1)
    name = F.regexp_replace(host, r":\d+$", "")
    return F.concat(
        F.array_join(F.reverse(F.split(name, r"\.")), ","), port
    )


def surt_key(col: Column | str) -> Column:
    """Full SURT-style canonical key: `reversed,host)/path?sortedquery`."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    path = F.regexp_extract(t, _PATH_RE, 1)
    path = F.regexp_replace(path, r"/index\.(html?|php)$", "")
    path = F.regexp_replace(path, r"/+$", "")
    query = F.regexp_extract(t, _QUERY_RE, 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        surt_host(c),
        F.lit(")"),
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def resolve_href(base_col: Column | str, href_col: Column | str) -> Column:
    """Resolve a link href against its page URL, the subset a canonical
    link needs: absolute http(s) hrefs pass through, protocol-relative
    (`//host/p`) take the base scheme, root-relative (`/p`) take the base
    origin. Everything else (document-relative paths, `javascript:`,
    empty) resolves to NULL — a crawl-scale canonicalizer should drop
    ambiguous declarations, not guess at dot-segment semantics. Pure
    Catalyst (regexp + concat), no UDF."""
    b = F.trim(F.col(base_col) if isinstance(base_col, str) else base_col)
    h = F.trim(F.col(href_col) if isinstance(href_col, str) else href_col)
    scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    origin = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    return (
        F.when(h.rlike("^(?i)https?://"), h)
        .when(h.startswith("//") & (scheme != ""), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/") & (origin != ""), F.concat(origin, h))
        .otherwise(F.lit(None).cast("string"))
    )


def canonical_link_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    canonical_col: str = "canonical",
) -> DataFrame:
    """Dup edges from the publisher's OWN `rel=canonical` declarations
    (extracted by `sources/html_extract.page_directives`): (id,
    canonical_id, surt) where a page's canonical link resolves — via
    `resolve_href` + `surt_key` — to another page's canonical URL key.
    AMP pages, print views, and session-URL variants all declare their
    way into the right cluster without any text comparison.

    Semantics: self-canonical declarations (the common hygiene no-op) are
    excluded by SURT inequality; declarations that resolve to no crawled
    page drop out of the inner join; when several pages share the target
    key, `canonical_id` is the min id (the same representative rule as
    every cluster label in this repo).

    Scale: two narrow projections of the corpus (id + one surt string
    each), a map-side-combinable min() per target key, and ONE shuffle
    join on the key. Declaration side is N:1 onto targets, so a popular
    canonical (thousands of AMP variants → one page) fans in, never out."""
    self_surt = surt_key(url_col)
    decl = (
        docs.filter(F.col(canonical_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            surt_key(resolve_href(url_col, canonical_col)).alias("surt"),
            self_surt.alias("_self"),
        )
        .filter(F.col("surt").isNotNull() & (F.col("surt") != F.col("_self")))
        .drop("_self")
    )
    targets = (
        docs.select(surt_key(url_col).alias("surt"), F.col(id_col).alias("_cid"))
        .groupBy("surt")
        .agg(F.min("_cid").alias("canonical_id"))
    )
    return decl.join(targets, on="surt").select("id", "canonical_id", "surt")


def url_dup_pairs(
    docs: DataFrame, id_col: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """Unordered id pairs sharing a canonical URL key: (id_a, id_b, surt).
    One shuffle on the key; within-key pair expansion uses the same
    in-bucket pattern as every other blocking strategy (sorted ids,
    id_a < id_b)."""
    keyed = docs.select(
        F.col(id_col).alias("id"), surt_key(url_col).alias("surt")
    )
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(b, on="surt")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "surt"
        )
    )


def latest_revision(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse crawl revisits: ONE kept row per canonical URL — the
    newest snapshot (ties → lowest id), with the revision count for
    auditing. The step between ingestion and text dedup on a corpus with
    recrawls: Common Crawl re-fetches popular pages every snapshot, and
    without this collapse every recrawl pair burns verify work
    downstream.

    One shuffle (the per-surt window); the frame carries only
    (id, surt, ts), and the caller joins winners back to payloads
    (left-semi shape, same as every keep join in this repo).
    """
    from pyspark.sql.window import Window

    keyed = docs.select(
        F.col(id_col).alias("id"),
        surt_key(url_col).alias("surt"),
        F.col(ts_col).alias("ts"),
    )
    w = Window.partitionBy("surt")
    wo = w.orderBy(F.col("ts").desc(), F.col("id").asc())
    return (
        keyed.withColumn("_rn", F.row_number().over(wo))
        .withColumn("n_revisions", F.count(F.lit(1)).over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "surt", F.col("ts").alias(ts_col), "n_revisions")
    )
