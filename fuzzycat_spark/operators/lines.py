"""Line-level corpus hygiene — the C4/CCNet half of training-data dedup.

Document-level near-dup detection (the rest of this repo) misses the
other pathology of web text: the SAME boilerplate line ("accept all
cookies", nav crumbs, copyright footers) stamped across millions of
otherwise-distinct pages, and documents that repeat their own lines.
C4 (Raffel et al. 2020) removed any three-sentence span occurring more
than once in the corpus; CCNet (Wenzek et al. 2020) dropped duplicate
paragraphs by hash. This module implements both granularities over a
newline-delimited text column:

- `line_stats`: per-document duplicate-line fraction and duplicate-line
  character fraction (Gopher A1's line-repetition signals) — pure
  Catalyst array expressions, ZERO shuffles, reusing the same sorted-run
  fold as the n-gram panel.
- `common_lines`: corpus-wide line frequencies — which exact lines
  appear in >= min_docs distinct documents.
- `strip_common_lines`: rewrite every document without its corpus-common
  lines, preserving original line order.

Scale shape (strip_common_lines): lines are exploded once with their
position, distinct'd per (line_hash, doc) — a map-side-combinable
aggregate, so a boilerplate line in 10^8 docs arrives at its reducer as
one row per upstream partition, not 10^8 rows — counted, and joined back
by 64-bit line hash (raw line text never rides a shuffle as a key; AQE
broadcasts the common-line table when it is small, which it is whenever
min_docs is meaningful). The rebuild groups each document's lines once,
sorts within the row, and concatenates — one narrow shuffle keyed by
doc id. Nothing is collected to the driver.

Lines are the non-empty segments after splitting on '\\n'; whitespace
inside a line is preserved (byte-exact lines are the unit, as in CCNet's
paragraph hashes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.repetition import dup_char_frac_of

__all__ = ["lines_col", "line_stats", "common_lines", "strip_common_lines"]


def lines_col(col: Column | str) -> Column:
    """Non-empty lines of a newline-delimited text column (array<string>;
    empty/blank text → empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\n"), lambda x: x != "")


def line_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document line repetition panel: (id, n_lines, dup_line_frac,
    dup_line_char_frac). dup_line_frac is the fraction of line slots
    occupied by repeats of an earlier line; dup_line_char_frac weights
    those repeats by character length (Gopher A1). Zero shuffles."""
    ls = lines_col(text_col)
    n = F.size(ls)
    dup_frac = F.when(
        n > 0,
        (n - F.size(F.array_distinct(ls))).cast("double") / n.cast("double"),
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n.cast("long").alias("n_lines"),
        dup_frac.alias("dup_line_frac"),
        dup_char_frac_of(ls).alias("dup_line_char_frac"),
    )


def _exploded_lines(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(lines_col(text_col)).alias("_pos", "_line"),
    )


def common_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Exact lines occurring in at least `min_docs` DISTINCT documents:
    (line, n_docs). The (line, doc) distinct is a partial-aggregatable
    shuffle on the line hash; the line text itself tags along only to be
    re-emitted, never compared."""
    per_doc = (
        _exploded_lines(docs, id_col, text_col)
        .select(F.xxhash64("_line").alias("_h"), "_line", "_id")
        .distinct()
    )
    return (
        per_doc.groupBy("_h")
        .agg(
            F.first("_line").alias("line"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("line", "n_docs")
    )


def strip_common_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
) -> DataFrame:
    """Rewrite each document without lines that occur in >= min_docs
    distinct documents (the document's own duplicates of a rare line are
    kept — the unit of commonness is cross-document, as in C4). Returns
    the full input schema with `text_col` replaced by the cleaned text,
    plus n_removed / n_kept counters. Documents reduced to nothing (or
    empty to begin with) keep an empty string."""
    lines = _exploded_lines(docs, id_col, text_col).withColumn(
        "_h", F.xxhash64("_line")
    )
    freq = (
        lines.select("_h", "_id")
        .distinct()
        .groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_h")
        .withColumn("_common", F.lit(True))
    )
    flagged = lines.join(freq, on="_h", how="left").select(
        "_id",
        "_pos",
        "_line",
        F.coalesce("_common", F.lit(False)).alias("_common"),
    )
    rebuilt = flagged.groupBy("_id").agg(
        F.sort_array(F.collect_list(F.struct("_pos", "_line", "_common"))).alias(
            "_arr"
        )
    )
    kept = F.filter(F.col("_arr"), lambda x: ~x["_common"])
    rebuilt = rebuilt.select(
        "_id",
        F.array_join(F.transform(kept, lambda x: x["_line"]), "\n").alias(
            "_clean"
        ),
        (F.size("_arr") - F.size(kept)).cast("long").alias("n_removed"),
        F.size(kept).cast("long").alias("n_kept"),
    )
    out_cols = [
        F.coalesce("_clean", F.lit("")).alias(c)
        if c == text_col
        else F.col(c)
        for c in docs.columns
    ]
    return docs.join(
        rebuilt, on=F.col(id_col) == F.col("_id"), how="left"
    ).select(
        *out_cols,
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
