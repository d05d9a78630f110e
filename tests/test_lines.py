"""Line-level hygiene (`operators/lines.py`): cross-doc common-line
removal vs within-doc repetition stay independent; order, counters, and
extra-column passthrough are preserved."""

from __future__ import annotations

import math

from fuzzycat_spark.operators.lines import (
    common_lines,
    line_stats,
    strip_common_lines,
)

BOILER = "accept all cookies to continue"


def _corpus(spark):
    rows = [
        (1, f"{BOILER}\nalpha one\nalpha two", "a"),
        (2, f"beta one\n{BOILER}\nbeta two", "b"),
        (3, f"gamma one\n{BOILER}", "c"),
        # internal repeat of a RARE line — must survive line_dedup
        (4, "delta one\ndelta one\ndelta two", "d"),
        (5, "", "e"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, extra string")


def test_common_lines_counts_distinct_docs(spark):
    got = {r.line: r.n_docs for r in common_lines(_corpus(spark)).collect()}
    assert got == {BOILER: 3}


def test_strip_common_lines_removes_only_cross_doc(spark):
    out = {r.doc_id: r for r in strip_common_lines(_corpus(spark)).collect()}
    assert out[1].text == "alpha one\nalpha two"
    assert out[2].text == "beta one\nbeta two" and out[2].n_removed == 1
    assert out[3].text == "gamma one"
    # within-doc repeats of a rare line are NOT corpus-common
    assert out[4].text == "delta one\ndelta one\ndelta two"
    assert out[4].n_removed == 0 and out[4].n_kept == 3
    assert out[5].text == "" and out[5].n_kept == 0
    # original schema rides along
    assert out[2].extra == "b"


def test_line_stats_fracs(spark):
    st = {r.doc_id: r for r in line_stats(_corpus(spark)).collect()}
    assert st[1].n_lines == 3 and st[1].dup_line_frac == 0.0
    # doc 4: 3 lines, "delta one" (9 chars) twice, "delta two" once ->
    # dup slots 1/3, dup chars 9 / 27
    assert math.isclose(st[4].dup_line_frac, 1 / 3)
    assert math.isclose(st[4].dup_line_char_frac, 9 / 27)
    assert st[5].n_lines == 0 and st[5].dup_line_char_frac == 0.0
