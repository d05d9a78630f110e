"""Deterministic synthetic Common-Crawl-style corpus with injected
duplicate families and golden cluster labels.

Implements the reference's proposed-but-unbuilt evaluation strategy
("1 original, plus N distorted documents",
`/root/reference/notes/matching_metrics.md:9`) over the graft input schema
(url, warc_ts, html, text, lang) from BASELINE.json input_hint.

Everything is a **pure Catalyst expression over spark.range(n)** — no
driver-side data, no Python in generation — so the same generator scales
from 2k rows in tests to billions on a cluster, partitioned by Spark's
range source. Determinism comes from xxhash64(seed, family, position).

Duplicate families (4 docs per family, kind chosen per-variant):

| kind        | distortion                              | label            |
|-------------|-----------------------------------------|------------------|
| original    | —                                       | cluster = family |
| exact       | byte-identical copy at a different url  | cluster = family |
| boilerplate | nav/footer words wrapped around body    | cluster = family |
| truncate    | 60–90 % token prefix (containment dup)  | cluster = family |
| reorder     | token rotation by k (order noise)       | cluster = family |
| edit        | ~5 % token churn                        | cluster = family |
| unicode     | vowels → diacritic variants             | cluster = family |
| numedit     | digit tokens interleaved, numbers differ | own cluster      |
| unique      | unrelated text                          | own cluster      |

Plus a **hot-key spam block**: `n_spam` near-identical near-empty pages
sharing one giant cluster — the skew case the reference handles by dropping
clusters > max size (`/root/reference/fuzzycat/__main__.py:220-223`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
PER_FAMILY = 4

# 256-word deterministic vocabulary (syllable product — no external data).
_SYLLABLES_A = ["ba", "co", "de", "fi", "gu", "ha", "jo", "ka", "lu", "me", "ni", "po", "qua", "re", "si", "tu"]
_SYLLABLES_B = ["lon", "mar", "nex", "per", "qit", "ros", "sun", "tam", "ver", "wix", "yel", "zor", "dal", "fen", "gor", "hul"]
VOCAB = [a + b for a in _SYLLABLES_A for b in _SYLLABLES_B]

_BOILER_HEADERS = ["home about contact news", "menu search login register", "skip to main content"]
_BOILER_FOOTERS = ["privacy terms copyright", "all rights reserved sitemap", "follow us newsletter"]

_LANGS = ["en", "en", "en", "en", "en", "en", "en", "de", "fr", "es"]  # skewed ~70% en

KINDS = ["exact", "exact", "boilerplate", "boilerplate", "truncate", "reorder",
         "edit", "unicode", "numedit", "unique"]
DUP_KINDS = {"original", "exact", "boilerplate", "truncate", "reorder", "edit", "unicode"}

_HTML_PRE = '<html><head><meta charset="utf-8"><title>'
_HTML_MID = '</title></head><body><nav>site navigation menu</nav><main>'
_HTML_POST = "</main><footer>generated fixture page</footer></body></html>"


def _h(*cols: Column | str | int) -> Column:
    """Deterministic non-negative 64-bit hash of the arguments + global seed."""
    lits = [F.lit(c) if not isinstance(c, Column) else c for c in cols]
    return F.abs(F.xxhash64(F.lit(SEED), *lits))


def _vocab_at(idx: Column) -> Column:
    return F.element_at(F.lit(VOCAB), (F.pmod(idx, F.lit(len(VOCAB))) + 1).cast("int"))


def _family_tokens(fid: Column, salt: str = "w") -> Column:
    """Base token array for a family: length 30–169, words by position hash.

    The word index hashes (fid, salt, position) jointly — XOR-combining
    separate hashes would make the index depend only on the low bits of each
    side, giving whole-family token-stream collisions mod |VOCAB|.
    """
    length = (F.pmod(_h(fid, "len", salt), F.lit(140)) + 30).cast("int")
    return F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda j: _vocab_at(_h(fid, salt, j)),
    )


def synth_pages(
    spark: SparkSession,
    n_families: int = 500,
    n_spam: int = 200,
    with_labels: bool = False,
) -> DataFrame:
    """Generate the pages corpus: (url, warc_ts, html, text, lang) [+ labels].

    Row count = n_families * 4 + n_spam. When ``with_labels`` the golden
    columns (true_cluster_id, family, kind) are appended — strip them before
    feeding the pipeline under test.
    """
    n_rows = n_families * PER_FAMILY
    df = spark.range(n_rows).select(
        (F.col("id") / PER_FAMILY).cast("long").alias("fid"),
        F.pmod(F.col("id"), F.lit(PER_FAMILY)).cast("int").alias("vidx"),
        F.col("id").alias("doc_id"),
    )

    kind_idx = F.pmod(_h(F.col("fid"), F.col("vidx"), "kind"), F.lit(len(KINDS))).cast("int")
    df = df.withColumn(
        "kind",
        F.when(F.col("vidx") == 0, F.lit("original")).otherwise(
            F.element_at(F.lit(KINDS), kind_idx + 1)
        ),
    )

    base = _family_tokens(F.col("fid"))
    n = F.size(base)
    trunc_len = F.greatest(
        (n * (F.pmod(_h(F.col("fid"), F.col("vidx"), "tr"), F.lit(31)) + 60) / 100).cast("int"),
        F.lit(5),
    )
    rot = (F.pmod(_h(F.col("fid"), F.col("vidx"), "rot"), F.lit(5)) + 1).cast("int")
    edited = F.transform(
        base,
        lambda w, j: F.when(
            F.pmod(_h(F.col("fid"), F.col("vidx"), "edit", j), F.lit(20)) == 0,
            _vocab_at(_h(F.col("fid"), F.col("vidx"), "repl", j)),
        ).otherwise(w),
    )
    header = F.element_at(F.lit(_BOILER_HEADERS), (F.pmod(_h(F.col("doc_id"), "hdr"), F.lit(3)) + 1).cast("int"))
    footer = F.element_at(F.lit(_BOILER_FOOTERS), (F.pmod(_h(F.col("doc_id"), "ftr"), F.lit(3)) + 1).cast("int"))
    # numedit: every 4th word REPLACED by a digit token; digits are doc-unique
    # (doc_id-offset) so two numedit variants of one family share the word
    # skeleton (digit-projections equal -> NUM_DIFF negative) while ~25 %
    # churn keeps them below the dup thresholds vs the rest of the family
    numedited = F.transform(
        base,
        lambda w, j: F.when(
            F.pmod(j, F.lit(4)) == 3,
            (F.pmod(F.col("doc_id") * 7 + j, F.lit(1000))).cast("string"),
        ).otherwise(w),
    )

    toks = (
        F.when(F.col("kind") == "truncate", F.slice(base, 1, trunc_len))
        .when(F.col("kind") == "reorder",
              F.concat(F.slice(base, rot + 1, n - rot), F.slice(base, 1, rot)))
        .when(F.col("kind") == "edit", edited)
        .when(F.col("kind") == "numedit", numedited)
        .when(F.col("kind") == "unique", _family_tokens(_h(F.col("doc_id"), "uniq")))
        .otherwise(base)
    )
    body = F.concat_ws(" ", toks)
    text = (
        F.when(F.col("kind") == "boilerplate",
               F.concat_ws(" ", header, body, footer))
        .when(F.col("kind") == "unicode", F.translate(body, "aeiou", "àéîöü"))
        .otherwise(body)
    )

    df = df.withColumn("text", text)
    labeled = df.withColumn(
        "true_cluster_id",
        F.when(F.col("kind").isin(*sorted(DUP_KINDS)), F.col("fid")).otherwise(
            F.lit(n_families) + F.col("doc_id")
        ),
    )

    # hot-key block: one of 3 near-identical boilerplate texts per page, so
    # three giant exact-dup clusters (labels -1, -2, -3)
    spam = spark.range(n_spam).select(
        F.lit(-1).cast("long").alias("fid"),
        F.lit(0).alias("vidx"),
        (F.col("id") + n_rows).alias("doc_id"),
        F.lit("spam").alias("kind"),
        F.concat(
            F.lit("welcome to the home page "),
            F.element_at(F.lit(_BOILER_FOOTERS), (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int")),
        ).alias("text"),
        (-1 - F.pmod(F.col("id"), F.lit(3))).cast("long").alias("true_cluster_id"),
    )
    labeled = labeled.unionByName(spam)

    out = labeled.select(
        F.concat(
            F.lit("https://site"),
            F.pmod(_h(F.col("doc_id"), "site"), F.lit(100)).cast("string"),
            F.lit(".example/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id")).alias("warc_ts"),
        F.concat(
            F.lit(_HTML_PRE),
            F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 5)),
            F.lit(_HTML_MID),
            F.col("text"),
            F.lit(_HTML_POST),
        ).cast("binary").alias("html"),
        F.col("text"),
        F.element_at(F.lit(_LANGS), (F.pmod(_h(F.col("doc_id"), "lang"), F.lit(10)) + 1).cast("int")).alias("lang"),
        "true_cluster_id",
        F.col("fid").alias("family"),
        "kind",
    )
    if not with_labels:
        out = out.select("url", "warc_ts", "html", "text", "lang")
    return out


# The real extractor lives in sources/html_extract.py (generic
# tag-strip + boilerplate-element drop + entity decode + block
# segmentation). On this synthetic corpus it returns exactly the `text`
# column — the north-star "byte-identical extracted text per url"
# invariant, pinned by test_extract_text_byte_identical.
from fuzzycat_spark.sources.html_extract import extract_text_udf  # noqa: E402,F401
