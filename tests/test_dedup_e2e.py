"""End-to-end pipeline test against the synthetic corpus's golden labels —
the graft's version of the reference's golden verify.csv strategy
(`/root/reference/tests/test_verify.py:51-80`), with pair-level
recall/precision as the metric (north rule: dup-pair recall >= 0.99)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fuzzycat_spark.operators.dedup import DedupConfig, candidate_pairs, dedup_pages
from fuzzycat_spark.sources import synth_pages


@pytest.fixture(scope="module")
def result(spark):
    corpus = synth_pages(spark, n_families=60, n_spam=30, with_labels=True).cache()
    pages = corpus.select("url", "warc_ts", "html", "text", "lang")
    verified, assign = dedup_pages(pages, DedupConfig())
    labeled = (
        assign.join(corpus.select(F.col("url").alias("id"), "true_cluster_id"), on="id")
        .select("id", "cluster_id", "true_cluster_id")
        .cache()
    )
    labeled.count()
    return labeled


def _pair_metrics(labeled):
    x, y = labeled.alias("x"), labeled.alias("y")
    tp = x.join(
        y,
        (F.col("x.true_cluster_id") == F.col("y.true_cluster_id"))
        & (F.col("x.id") < F.col("y.id")),
    )
    tot = tp.count()
    hit = tp.filter(F.col("x.cluster_id") == F.col("y.cluster_id")).count()
    pp = x.join(
        y,
        (F.col("x.cluster_id") == F.col("y.cluster_id"))
        & (F.col("x.id") < F.col("y.id")),
    )
    ptot = pp.count()
    phit = pp.filter(F.col("x.true_cluster_id") == F.col("y.true_cluster_id")).count()
    return hit / max(tot, 1), phit / max(ptot, 1), tot


def test_dup_pair_recall_and_precision(result):
    recall, precision, total = _pair_metrics(result)
    assert total > 100
    assert recall >= 0.99, f"dup-pair recall {recall} below north-rule threshold"
    assert precision >= 0.98, f"pair precision {precision} too low"


def test_assignments_cover_all_docs(spark, result):
    n_docs = 60 * 4 + 30
    assert result.count() == n_docs
    # cluster_id is always the lexicographic min id of its cluster
    bad = (
        result.groupBy("cluster_id")
        .agg(F.min("id").alias("min_id"))
        .filter(F.col("cluster_id") != F.col("min_id"))
        .count()
    )
    assert bad == 0


def test_all_strategy_pipeline_composes(spark):
    """EVERY strategy enabled at once (the driver's `components_all`
    shape): recall must not drop below the default config's, precision
    must hold, and the extra strategies must not fracture clusters."""
    corpus = synth_pages(spark, n_families=40, n_spam=20, with_labels=True).cache()
    pages = corpus.select("url", "warc_ts", "html", "text", "lang")
    cfg = DedupConfig(
        strategies=("exact", "slug", "minhash", "simhash", "substring", "winnow")
    )
    _, assign = dedup_pages(pages, cfg)
    labeled = assign.join(
        corpus.select(F.col("url").alias("id"), "true_cluster_id"), on="id"
    ).select("id", "cluster_id", "true_cluster_id")
    recall, precision, total = _pair_metrics(labeled)
    assert total > 50
    assert recall >= 0.99, f"all-strategy recall {recall} below threshold"
    assert precision >= 0.98, f"all-strategy precision {precision} too low"


def test_substring_strategy_clusters_short_contained_docs(spark):
    """A 30-token doc verbatim inside a 600-token doc: every LSH band
    misses it (shingle jaccard ~0.05), but the substring strategy's
    guaranteed-recall candidates + the cascade's CONTAINMENT rule must
    cluster them."""
    from fuzzycat_spark.operators.dedup import DedupConfig, dedup_pages

    words = [f"w{i}" for i in range(600)]
    rows = [
        ("big", " ".join(words)),
        ("small", " ".join(words[200:230])),
        ("other", " ".join(f"z{i}" for i in range(80))),
    ]
    df = spark.createDataFrame(rows, "url string, text string")

    base = DedupConfig(strategies=("exact", "slug", "minhash"))
    _, assign_base = dedup_pages(df, base)
    got_base = {r.id: r.cluster_id for r in assign_base.collect()}

    withss = DedupConfig(strategies=("exact", "slug", "minhash", "substring"))
    verified, assign = dedup_pages(df, withss)
    got = {r.id: r.cluster_id for r in assign.collect()}
    vmap = {(r.id_a, r.id_b): (r.status, r.reason) for r in verified.collect()}

    assert got_base["small"] != got_base["big"]          # the tier LSH misses
    assert got["small"] == got["big"]                    # substring catches it
    assert got["other"] not in (got["big"],)
    assert vmap[("big", "small")] == ("strong", "CONTAINMENT")


def test_unicode_slug_mode_clusters_non_latin_families(spark):
    """Greek/Cyrillic/decomposed-accent dup families: the default ASCII
    fold keys them on lossy residue (Greek folds to empty, combining marks
    split tokens), so they must NOT cluster; slug_mode='unicode' must
    cluster each family exactly (reference normalizer scope:
    fuzzycat/sandcrawler.py:5-64)."""
    fams = [
        [
            "Η Ελλάδα είναι μια όμορφη χώρα με μεγάλη ιστορία",
            "η ελλαδα ειναι μια ομορφη χωρα με μεγαλη ιστορια",
            "Η ΕΛΛΆΔΑ ΕΊΝΑΙ ΜΙΑ ΌΜΟΡΦΗ ΧΏΡΑ, ΜΕ ΜΕΓΆΛΗ ΙΣΤΟΡΊΑ!",
        ],
        [
            "Москва является столицей Российской Федерации уже давно",
            "МОСКВА ЯВЛЯЕТСЯ СТОЛИЦЕЙ РОССИЙСКОЙ ФЕДЕРАЦИИ УЖЕ ДАВНО",
        ],
        [
            "Café résumé naïve façade déjà vu encore une fois",
            "CAFÉ RÉSUMÉ NAÏVE FAÇADE "
            "DÉJÀ VU ENCORE UNE FOIS",
        ],
    ]
    rows = [
        (f"d{i}_{j}", t, i) for i, fam in enumerate(fams) for j, t in enumerate(fam)
    ]
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "url string, text string"
    )
    true_fam = {r[0]: r[2] for r in rows}

    def n_true_pairs(assign_df):
        got = {r.id: r.cluster_id for r in assign_df.collect()}
        return sum(
            1
            for x in got
            for y in got
            if x < y and true_fam[x] == true_fam[y] and got[x] == got[y]
        ), got

    _, a_ascii = dedup_pages(df, DedupConfig(strategies=("slug",)))
    ascii_hits, _ = n_true_pairs(a_ascii)
    _, a_uni = dedup_pages(
        df, DedupConfig(strategies=("slug",), slug_mode="unicode")
    )
    uni_hits, uni_clusters = n_true_pairs(a_uni)
    total_true = 3 + 1 + 1  # C(3,2) + C(2,2) + C(2,2)
    assert uni_hits == total_true, f"unicode recall {uni_hits}/{total_true}"
    assert ascii_hits < total_true  # the ASCII fold provably misses these
    # no cross-family merges under unicode
    assert len({uni_clusters[f"d{i}_0"] for i in range(3)}) == 3


def test_auto_slug_mode_routes_rows_by_script(spark):
    """slug_mode='auto': non-ASCII rows get unicode keys, pure-ASCII rows
    keep the codegen fold — both families cluster in ONE run."""
    rows = [
        ("g0", "Η Ελλάδα είναι μια όμορφη χώρα με μεγάλη ιστορία"),
        ("g1", "Η ΕΛΛΆΔΑ ΕΊΝΑΙ ΜΙΑ ΌΜΟΡΦΗ ΧΏΡΑ, ΜΕ ΜΕΓΆΛΗ ΙΣΤΟΡΊΑ!"),
        ("a0", "plain ascii duplicate family text with enough tokens"),
        ("a1", "Plain ASCII duplicate family text, with enough tokens!"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    _, assign = dedup_pages(df, DedupConfig(strategies=("slug",), slug_mode="auto"))
    got = {r.id: r.cluster_id for r in assign.collect()}
    assert got["g0"] == got["g1"]
    assert got["a0"] == got["a1"]
    assert got["g0"] != got["a0"]


def test_cjk_bigram_tokens_enable_cjk_near_dedup(spark):
    """No-space scripts: under unicode mode, CJK runs tokenize into
    character bigrams, so the length screens pass and MinHash/jaccard see
    a real token stream — a Japanese near-dup family (punctuation variant
    + small edit) must cluster, and an unrelated CJK doc must not."""
    fam = "東京は日本の首都です。人口はとても多く、経済の中心でもあります。毎年多くの観光客が訪れます。"
    rows = [
        ("j0", fam),
        ("j1", fam.replace("。", " ")),               # punctuation variant
        ("j2", fam.replace("観光客", "旅行者")),        # small edit
        ("j3", "大阪は関西地方の大きな都市で、食文化がとても有名です。たこ焼きやお好み焼きが人気です。"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    cfg = DedupConfig(
        strategies=("exact", "slug", "minhash"), slug_mode="unicode"
    )
    _, assign = dedup_pages(df, cfg)
    got = {r.id: r.cluster_id for r in assign.collect()}
    assert got["j0"] == got["j1"] == got["j2"]
    assert got["j3"] != got["j0"]


def test_denylisted_families_stay_unclustered(spark):
    """The default web-boilerplate denylist (functions/denylist.py — the
    graft of the reference's blacklist data, data.py:12-34): pages whose
    SLUG is denylisted must not cluster by slug equality (no star edges,
    no slug bands, cascade says ambiguous/BLACKLISTED), while
    byte-identical junk still dedupes via CONTENT_HASH and real content
    is untouched. denylist_keys=() restores the round-3 behavior."""
    deny_variants = [
        "Your browser is out of date!",
        "your browser is out of date...",
        "Your Browser -- Is Out Of Date",
    ]
    real = "the migration of arctic terns spans many thousand kilometers yearly"
    rows = [
        ("d0", deny_variants[0]),
        ("d1", deny_variants[1]),
        ("d2", deny_variants[2]),
        ("x0", deny_variants[0]),          # byte-identical to d0
        ("r0", real),
        ("r1", real + "!"),                # slug-equal real family
    ]
    df = spark.createDataFrame(rows, "url string, text string")
    cfg = DedupConfig(strategies=("exact", "slug", "minhash"))

    verified, assign = dedup_pages(df, cfg)
    got = {r.id: r.cluster_id for r in assign.collect()}
    assert got["d0"] == got["x0"]          # exact content hash still links
    assert got["d1"] not in (got["d0"], got["d2"])  # no slug clustering
    assert got["d2"] != got["d0"]
    assert got["r0"] == got["r1"]          # real slug family untouched
    reasons = {
        (r.id_a, r.id_b): (r.status, r.reason) for r in verified.collect()
    }
    d_pairs = [
        v for (a, b), v in reasons.items()
        if a.startswith(("d", "x")) and b.startswith(("d", "x")) and v[1] != "CONTENT_HASH"
    ]
    assert d_pairs and all(v == ("ambiguous", "BLACKLISTED") for v in d_pairs), reasons

    # kill switch: an empty denylist restores slug clustering
    _, assign_off = dedup_pages(df, DedupConfig(
        strategies=("exact", "slug", "minhash"), denylist_keys=()
    ))
    off = {r.id: r.cluster_id for r in assign_off.collect()}
    assert off["d0"] == off["d1"] == off["d2"] == off["x0"]


def test_unicode_mode_reaches_every_strategy(spark):
    """Under slug_mode="unicode" the simhash, substring, and winnow
    strategies must tokenize the same CJK-bigram stream as slug/minhash —
    a CJK near-dup family must surface with EACH strategy alone (the
    round-3 ASCII-fold internals yielded zero tokens for pure-CJK text,
    silently disabling 3 of 6 strategies on non-Latin corpora)."""
    fam = (
        "東京は日本の首都であり、世界有数の大都市圏を形成している。"
        "人口は千四百万人を超え、政治と経済と文化の中心地として発展を続けている。"
        "観光客には浅草や渋谷や新宿が人気で、四季折々の祭りも多く開催される。"
    )
    rows = [
        ("c0", fam),
        ("c1", fam.replace("観光客", "旅行者")),   # small edit -> near dup
        ("c2", fam[: len(fam) // 2]),               # prefix -> containment dup
        ("c3", "大阪は関西地方の大きな都市で、食文化がとても有名です。たこ焼きやお好み焼きが人気で、商人の町として栄えた歴史を持つ。"),
    ]
    df = spark.createDataFrame(rows, "url string, text string")

    for strategy in ("simhash", "winnow"):
        cfg = DedupConfig(strategies=(strategy,), slug_mode="unicode")
        cands = candidate_pairs(df, cfg)
        got = {(r.id_a, r.id_b) for r in cands.collect()}
        assert ("c0", "c1") in got, f"{strategy} missed the CJK near-dup: {got}"

    from fuzzycat_spark.operators.substring import exact_substring_pairs

    ss = exact_substring_pairs(df, "url", "text", k=10, slug_mode="unicode")
    got = {(r.id_in, r.id_of) for r in ss.collect()}
    assert ("c2", "c0") in got, f"substring missed the CJK containment: {got}"
    # ascii mode on the same corpus: pure-CJK text folds to nothing
    assert (
        exact_substring_pairs(df, "url", "text", k=10, slug_mode="ascii").count() == 0
    )


def test_expand_cjk_bigrams_unit(spark):
    from pyspark.sql import functions as F

    from fuzzycat_spark.functions.normalize import expand_cjk_bigrams

    df = spark.createDataFrame(
        [(["東京は日本", "hello", "犬", "ab東京", "abc東", "東x京"],)],
        "toks array<string>",
    )
    got = df.select(expand_cjk_bigrams(F.col("toks")).alias("t")).first().t
    assert got == [
        "東京", "京は", "は日", "日本",  # 5-char CJK run -> 4 bigrams
        "hello",                          # latin passes through
        "犬",                             # single CJK char passes whole
        "ab", "東京",                     # script runs split: latin run whole, CJK run bigrammed
        "abc", "東",                      # one embedded CJK char no longer shreds the latin run
        "東", "x", "京",                  # alternating runs each pass whole
    ]


def test_expand_cjk_bigrams_supplementary_han(spark):
    """Supplementary-plane Han (CJK Ext B+, e.g. U+20000) counts as CJK:
    a rare-character run must bigram instead of staying one mega-token."""
    from pyspark.sql import functions as F

    from fuzzycat_spark.functions.normalize import expand_cjk_bigrams

    run = "\U00020000\U00020001\U00020002"
    df = spark.createDataFrame([([run],)], "toks array<string>")
    got = df.select(expand_cjk_bigrams(F.col("toks")).alias("t")).first().t
    assert got == ["\U00020000\U00020001", "\U00020001\U00020002"]


def test_canonical_link_edges_cluster_text_dissimilar_variants(spark):
    """cfg.canonical_col: a publisher-declared rel=canonical edge links
    an AMP stub to its article even though every text strategy refuses
    the pair (the stub's text shares nothing with the article); without
    the config the same corpus leaves them apart."""
    rows = [
        ("https://example.com/articles/42",
         "the full article text about rivers bridges canals ferries "
         "locks and harbors at length", None),
        ("https://amp.example.com/a42/amp",
         "amp stub completely different words here truncated teaser",
         "https://example.com/articles/42"),
        ("https://example.com/other",
         "an unrelated page about astronomy telescopes and comets",
         None),
    ]
    docs = spark.createDataFrame(
        rows, "url string, text string, canonical string"
    )
    base = DedupConfig(strategies=("exact", "slug", "minhash"))
    _, plain = dedup_pages(docs, base)
    n_plain = plain.select("cluster_id").distinct().count()
    assert n_plain == 3  # no text strategy links the stub

    cfg = DedupConfig(
        strategies=("exact", "slug", "minhash"), canonical_col="canonical"
    )
    verified, assigned = dedup_pages(docs, cfg)
    reasons = {r.reason for r in verified.collect()}
    assert "CANONICAL_LINK" in reasons
    labels = {r.id: r.cluster_id for r in assigned.collect()}
    assert labels["https://amp.example.com/a42/amp"] == labels[
        "https://example.com/articles/42"
    ]
    assert labels["https://example.com/other"] not in (
        labels["https://example.com/articles/42"],
    )


def test_canonical_edge_outranks_blacklisted_verdict(spark):
    """Per-pair precedence: a publisher-declared CANONICAL_LINK edge is
    text-independent, so it must survive even when the cascade marks the
    same pair ('ambiguous', BLACKLISTED) via the default web denylist —
    previously the alphabetical tiebreak dropped the declared edge."""
    rows = [
        ("https://example.com/a", "untitled document", None),
        ("https://example.com/b", "untitled  document",  # same slug
         "https://example.com/a"),
    ]
    docs = spark.createDataFrame(
        rows, "url string, text string, canonical string"
    )
    cfg = DedupConfig(
        strategies=("exact", "minhash"), canonical_col="canonical"
    )
    verified, assigned = dedup_pages(docs, cfg)
    v = {(r.id_a, r.id_b): (r.status, r.reason) for r in verified.collect()}
    pair = ("https://example.com/a", "https://example.com/b")
    assert v[pair] == ("exact", "CANONICAL_LINK")
    labels = {r.id: r.cluster_id for r in assigned.collect()}
    assert labels[pair[0]] == labels[pair[1]]
