"""Cross-document duplicate-span removal — token-level exact-substring
dedup in the style of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better"), the ExactSubstr operation.

Document-level dedup (stars/LSH/SimHash elsewhere in this repo) keeps or
drops WHOLE documents; web corpora additionally contain long verbatim
passages (licenses, quoted articles, templated paragraphs) embedded in
otherwise-distinct pages. ExactSubstr removes any token span of length
>= k that occurs more than once in the corpus, from every occurrence.
The reference pipeline has no analog (fuzzycat clusters whole records,
`/root/reference/fuzzycat/cluster.py`); this is the graft's
training-data extension of its containment checks
(`operators/substring.py` detects PAIRS; this REWRITES the text).

Semantics (k-gram coverage formulation):
- tokens = the document split on explicit whitespace [ \\t\\r\\n]+.
- A k-gram (k consecutive tokens) is *duplicated* when its exact text
  occurs >= min_count times corpus-wide (all occurrences count, so a
  document repeating its own passage trips it too — as in Lee et al.).
- A token is removed iff some duplicated k-gram covers it. This equals
  "remove every maximal duplicated span of length >= k": a span of
  length L >= k duplicated elsewhere has all L-k+1 of its k-grams
  duplicated, so the whole span is covered; no token outside a
  duplicated window is ever touched.
- Output text is the kept tokens joined by single spaces (the token
  stream is the unit, as in the suffix-array formulation; original
  inter-token whitespace is not preserved).

Scale shape:
- Gram hashes are 64-bit (`md5_h64` of the space-joined gram), computed
  JVM-side inside whole-stage codegen; gram TEXT never rides a shuffle.
- Corpus-wide occurrence counts are one partial-aggregated groupBy on
  the 8-byte hash (a boilerplate gram in 10^8 docs arrives at its
  reducer pre-combined per upstream partition).
- Duplicated-gram starts flow back via a LEFT SEMI join on the hash
  (AQE broadcasts the dup table when it is small).
- Coverage is ONE range-frame window per document over a UNION of token
  rows and start rows — no token-level join: covered(t) =
  max(start_flag) over pos range [t-k+1, t]. Linear in tokens, never
  O(tokens x dup_starts).
- The rebuild groups each document once (hash partitioning by id is
  reused from the window exchange where possible) and the page payload
  joins back only at the end, keyed by id.

Batch-only by design: an incremental variant is ill-defined — a gram
arriving in epoch N can flip earlier epochs' removal decisions, and the
already-emitted corpus cannot be retracted. Run it over the kept corpus
per training-set build (as Lee et al. do), not inside the streaming
path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import md5_h64

__all__ = ["raw_tokens", "dup_span_starts", "strip_dup_spans"]

# Explicit class, identical under Java regex (Spark) and RE2 (DuckDB
# string_split_regex): Java's \s includes \x0B, RE2's does not, so the
# oracle would silently diverge on vertical-tab text if we used \s.
_WS_CLASS = "[ \t\r\n]+"


def raw_tokens(col: Column | str) -> Column:
    """Whitespace tokens of the RAW text (array<string>, no empties).
    Unlike `normalize.tokens_col` this does not fold case or strip
    punctuation — span removal rewrites the document, so the token
    stream must carry the original content."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, _WS_CLASS), lambda x: x != "")


def _gram_hashes(toks: Column, k: int) -> Column:
    """array<long> of k-gram hashes: h[i] = md5_h64 of tokens i..i+k-1
    joined by ' ' (0-based starts; empty array when fewer than k
    tokens — sequence() would otherwise count DOWN and emit bogus
    negative starts)."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), n - k),
        lambda i: md5_h64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return F.when(n >= k, grams).otherwise(
        F.array().cast("array<long>")
    )


def dup_span_starts(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """(id, pos) of every k-gram start whose gram occurs >= min_count
    times corpus-wide. Exposed for auditing; `strip_dup_spans` composes
    it into the rewrite."""
    base = docs.select(
        F.col(id_col).alias("_id"), raw_tokens(text_col).alias("_toks")
    )
    gram_rows = base.select(
        "_id", F.posexplode(_gram_hashes(F.col("_toks"), k)).alias("_pos", "_gh")
    )
    dup = (
        gram_rows.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_gh")
    )
    return gram_rows.join(dup, on="_gh", how="left_semi").select("_id", "_pos")


def strip_dup_spans(
    docs: DataFrame,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 2,
) -> DataFrame:
    """Rewrite every document with its duplicated >= k-token spans
    removed (from ALL occurrences, as in Lee et al.'s ExactSubstr).

    Returns the input schema with `text_col` replaced by the cleaned
    token stream (single-space joined), plus:
    - n_tokens: tokens before removal
    - n_removed: tokens removed (0 for docs shorter than k tokens)
    Documents reduced to nothing keep an empty string."""
    base = docs.select(
        F.col(id_col).alias("_id"), raw_tokens(text_col).alias("_toks")
    )
    tok_rows = base.select(
        "_id",
        F.posexplode("_toks").alias("_pos", "_tok"),
    ).withColumn("_d", F.lit(0))
    gram_rows = base.select(
        "_id", F.posexplode(_gram_hashes(F.col("_toks"), k)).alias("_pos", "_gh")
    )
    dup = (
        gram_rows.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_count)
        .select("_gh")
    )
    starts = (
        gram_rows.join(dup, on="_gh", how="left_semi")
        .select("_id", "_pos")
        .withColumn("_tok", F.lit(None).cast("string"))
        .withColumn("_d", F.lit(1))
    )
    # one range-frame window: a token at pos p is covered iff some dup
    # gram STARTS within [p-k+1, p]; start rows carry _d=1, token rows
    # _d=0, so max(_d) over the frame is the coverage bit. Range frames
    # are by VALUE, so co-located token/start rows at the same pos need
    # no ordering tiebreak.
    w = (
        Window.partitionBy("_id")
        .orderBy("_pos")
        .rangeBetween(-(k - 1), Window.currentRow)
    )
    flagged = (
        tok_rows.select("_id", "_pos", "_tok", "_d")
        .unionByName(starts.select("_id", "_pos", "_tok", "_d"))
        .withColumn("_cov", F.max("_d").over(w))
        .filter(F.col("_tok").isNotNull())
    )
    kept_arr = F.filter(F.col("_arr"), lambda x: x["_cov"] == 0)
    rebuilt = (
        flagged.groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_pos", "_tok", "_cov"))
            ).alias("_arr")
        )
        .select(
            "_id",
            F.array_join(
                F.transform(kept_arr, lambda x: x["_tok"]), " "
            ).alias("_clean"),
            F.size("_arr").cast("long").alias("n_tokens"),
            (F.size("_arr") - F.size(kept_arr)).cast("long").alias("n_removed"),
        )
    )
    out_cols = [
        F.coalesce("_clean", F.lit("")).alias(c) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    return docs.join(rebuilt, on=F.col(id_col) == F.col("_id"), how="left").select(
        *out_cols,
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
    )
