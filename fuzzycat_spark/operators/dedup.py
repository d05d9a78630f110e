"""End-to-end dedup pipelines: blocking → candidates → verify → components.

The full graft of the reference's `cluster | verify` dataflow
(`/root/reference/notes/old_pipeline.md:13-27` + `fuzzycat/verify.py:100-147`)
onto web pages. Deterministic key-equality strategies (exact content
hash, slug key) link clusters via O(n) star edges (`star_edges`);
approximate strategies (MinHash-LSH, SimHash buckets) go through capped
pair expansion + the verify cascade; real connected components replace
"cluster = records sharing one key".

Every block key that crosses a shuffle is a fixed-width hash (md5/long),
never the raw slug/text — at 100 TB the shuffle payload is (id, key) only.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fuzzycat_spark.functions.hashing import content_hash
from fuzzycat_spark.functions.normalize import slug_text
from fuzzycat_spark.operators.lsh import (
    lsh_candidate_pairs,
    minhash_band_table,
    simhash_bucket_table,
)
from fuzzycat_spark.operators.components import connected_components
from fuzzycat_spark.plans.checkpoint import materialize
from fuzzycat_spark.operators.verify import prepare_pages, verify_pairs

EDGE_STATUSES = ("exact", "strong")  # statuses that link a cluster, like the
# reference's STATUS_SORT keep-set (/root/reference/fuzzycat/simple.py:40-47
# drops TODO/DIFFERENT; we additionally exclude weak/ambiguous from edges)


@dataclass
class DedupConfig:
    id_col: str = "url"
    text_col: str = "text"
    strategies: tuple[str, ...] = ("exact", "slug", "minhash")
    num_perm: int = 32
    bands: int = 16
    rows: int = 2
    shingle_n: int = 3
    minhash_udf: bool = True
    max_block_size: int = 100
    max_bucket_size: int = 200
    simhash_band_bits: int = 8
    # "substring" strategy: guaranteed-recall containment candidates
    # (operators/substring.py) — catches short-doc-in-long-doc dups whose
    # jaccard is too low for any LSH band; min contained length in tokens
    substring_k: int = 25
    # slug normalization for keys/tokens/shingles: "ascii" (pure-Catalyst
    # fold, Latin corpora), "unicode" (NFKD/category-strip pandas UDF, the
    # reference sandcrawler normalizer's scope), or "auto" (per-row:
    # unicode for rows containing non-ASCII, ascii fold otherwise)
    slug_mode: str = "ascii"
    # "nysiis" strategy: phonetic blocking over a NAME column (the
    # reference ran NYSIIS as a first-class key algorithm,
    # notes/matching_metrics.md:13-14) — homophone families bucket
    # together, then the cascade verifies like any approximate strategy
    name_col: str | None = None
    # "winnow" strategy: winnowing fingerprints (SIGMOD'04) as band keys —
    # two docs sharing a token run of >= winnow_w + winnow_k - 1 are
    # GUARANTEED a common bucket, catching shared-paragraph partial
    # overlap whose whole-doc jaccard is below every LSH band's reach
    winnow_k: int = 3
    winnow_w: int = 4
    # "embedding" strategy: semantic near-dup via an embedding column —
    # hyperplane-LSH buckets generate candidates, and pairs whose cosine
    # >= embedding_strong get ('strong', 'EMBEDDING_COSINE') BEFORE the
    # text cascade (paraphrase dups have dissimilar text by definition,
    # so the text rules alone would refuse them). embedding_dim is
    # required with the strategy (schema carries no array length).
    embedding_col: str | None = None
    embedding_dim: int | None = None
    embedding_planes: int = 8
    embedding_strong: float = 0.9
    # candidate index for the embedding strategy: "hyperplane" buckets
    # (2^planes buckets — size n_planes to the corpus) or "ivf" inverted
    # lists (k-means coarse cells — bucket count set directly by
    # embedding_ivf_k and INDEPENDENT of dimension/plane geometry, the
    # standard 10^9-vector layout; cluster-boundary pairs are the recall
    # tradeoff either way, and both routes share the capped band machinery
    # and the cosine tier)
    embedding_index: str = "hyperplane"
    embedding_ivf_k: int = 8
    # boilerplate denylist (the graft of the reference's blacklist data,
    # data.py:12-34): md5 slug keys whose SLUG equality is meaningless —
    # they never form slug star edges or slug band rows, and the cascade
    # marks their pairs ambiguous/"BLACKLISTED" (byte-identical junk still
    # dedupes via CONTENT_HASH). Defaults to the committed web-boilerplate
    # list; pass () to disable, or your own denylist_slug_keys(...) tuple.
    denylist_keys: tuple[str, ...] | None = None
    # mega-cluster softener: when > 0, buckets over their cap are re-keyed
    # into this many salted shards BEFORE the cap filter, so a hot bucket
    # keeps ~1/salt_hot of its pairs (sharded) instead of yielding zero —
    # the shards reconnect through connected components when any member
    # links them. 0 (default) = capped buckets drop entirely, the
    # reference's max-cluster-size behavior (verify.py:130-131).
    salt_hot: int = 0
    # publisher-declared edges: when set, <link rel=canonical> hrefs in
    # this column (as sources/html_extract.page_directives extracts them)
    # become ('exact', 'CANONICAL_LINK') edges via
    # functions/urls.canonical_link_pairs — AMP/print/session variants
    # cluster with zero text comparison. canonical_url_col is the page-URL
    # column hrefs resolve against (defaults to id_col, which IS the url
    # in the web pipeline).
    canonical_col: str | None = None
    canonical_url_col: str | None = None
    edge_statuses: tuple[str, ...] = field(default_factory=lambda: EDGE_STATUSES)


def _deny(cfg: "DedupConfig") -> tuple[str, ...]:
    """Resolve cfg.denylist_keys (None -> the default web denylist)."""
    if cfg.denylist_keys is None:
        from fuzzycat_spark.functions.denylist import DEFAULT_DENYLIST_KEYS

        return DEFAULT_DENYLIST_KEYS
    return cfg.denylist_keys


def strategy_band_table(
    prep: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    pages: DataFrame | None = None,
) -> DataFrame:
    """(id, band_id, band_hash, cap) rows for every enabled blocking
    strategy — the shared candidate-generation surface for the batch
    pipeline AND the streaming index (which persists these rows as its
    grow-only LSH state).

    Exact hash and slug key are single-band strategies ('exact'/'slug'
    band ids) capped at max_block_size; MinHash LSH bands are capped at
    max_bucket_size. `pages` is only needed for the simhash strategy
    (it re-tokenizes raw text).
    """
    tables = []
    if "exact" in cfg.strategies:
        tables.append(
            prep.select(
                "id", F.lit("exact").alias("band_id"), F.col("ch").alias("band_hash")
            ).filter(F.col("band_hash").isNotNull())
        )
    if "slug" in cfg.strategies:
        deny = _deny(cfg)
        slug_rows = prep.select(
            "id",
            F.lit("slug").alias("band_id"),
            F.col("slug_key").alias("band_hash"),
        ).filter(F.col("band_hash").isNotNull())
        if deny:
            slug_rows = slug_rows.filter(~F.col("band_hash").isin(*deny))
        tables.append(slug_rows)
    if "minhash" in cfg.strategies:
        tables.append(
            minhash_band_table(
                prep, "id", cfg.text_col, cfg.num_perm, cfg.bands,
                cfg.rows, cfg.shingle_n, use_udf=cfg.minhash_udf,
                h64_col="shingles_h" if cfg.minhash_udf else None,
                shingles_col=None if cfg.minhash_udf else "shingles",
            ).select("id", F.col("band_id").cast("string").alias("band_id"), "band_hash")
        )
    if "simhash" in cfg.strategies:
        if "tok_h32" in prep.columns:
            # fingerprint off the prep checkpoint's per-token hashes —
            # no second text scan / tokenization (see prepare_pages)
            from fuzzycat_spark.operators.lsh import simhash_bucket_table_from_hashes

            sh = simhash_bucket_table_from_hashes(prep, cfg.simhash_band_bits)
        elif pages is None:
            raise ValueError(
                "simhash strategy needs prep with tok_h32 or the raw pages frame"
            )
        else:
            sh = simhash_bucket_table(
                pages, cfg.id_col, cfg.text_col, cfg.simhash_band_bits,
                slug_mode=cfg.slug_mode,
            )
        tables.append(
            sh.select(
                "id",
                F.concat(F.lit("sh"), F.col("band_id").cast("string")).alias("band_id"),
                "band_hash",
            )
        )
    if "embedding" in cfg.strategies:
        if pages is None or cfg.embedding_col is None or cfg.embedding_dim is None:
            raise ValueError(
                "embedding strategy needs the raw pages frame plus "
                "cfg.embedding_col and cfg.embedding_dim"
            )
        if cfg.embedding_index == "ivf":
            from fuzzycat_spark.operators.knn import ivf_assign, ivf_centroids

            emb = pages.select(
                F.col(cfg.id_col).alias("id"),
                F.col(cfg.embedding_col).alias("embedding"),
            )
            cents = ivf_centroids(
                emb, k=cfg.embedding_ivf_k, n_iter=1, id_col="id",
                vec_col="embedding",
            )
            tables.append(
                ivf_assign(emb, cents, id_col="id", vec_col="embedding").select(
                    F.col("vec_id_").alias("id"),
                    F.lit("emb").alias("band_id"),
                    F.col("cid").cast("string").alias("band_hash"),
                )
            )
        elif cfg.embedding_index == "hyperplane":
            from fuzzycat_spark.operators.knn import (
                hyperplane_bucket_col,
                hyperplane_planes,
            )

            planes = hyperplane_planes(cfg.embedding_dim, cfg.embedding_planes)
            tables.append(
                pages.select(
                    F.col(cfg.id_col).alias("id"),
                    F.lit("emb").alias("band_id"),
                    hyperplane_bucket_col(F.col(cfg.embedding_col), planes).alias(
                        "band_hash"
                    ),
                ).filter(F.col("band_hash").isNotNull())
            )
        else:
            raise ValueError(f"unknown embedding_index: {cfg.embedding_index!r}")
    if "winnow" in cfg.strategies:
        if pages is None:
            raise ValueError("winnow strategy needs the raw pages frame")
        from fuzzycat_spark.operators.winnow import winnow_fingerprints

        tables.append(
            winnow_fingerprints(
                pages, cfg.id_col, cfg.text_col, k=cfg.winnow_k, w=cfg.winnow_w,
                slug_mode=cfg.slug_mode,
            )
            .select(
                "id",
                F.lit("winnow").alias("band_id"),
                F.col("fp").cast("string").alias("band_hash"),
            )
            .distinct()
        )
    if "nysiis" in cfg.strategies:
        if pages is None or cfg.name_col is None:
            raise ValueError(
                "nysiis strategy needs the raw pages frame and cfg.name_col"
            )
        from fuzzycat_spark.functions.phonetic import nysiis_name_key

        tables.append(
            pages.select(
                F.col(cfg.id_col).alias("id"),
                F.lit("nysiis").alias("band_id"),
                nysiis_name_key(F.col(cfg.name_col)).alias("band_hash"),
            ).filter(F.col("band_hash").isNotNull() & (F.col("band_hash") != ""))
        )
    if not tables:
        raise ValueError(f"no blocking strategies enabled: {cfg.strategies}")
    bands = tables[0]
    for t in tables[1:]:
        bands = bands.unionByName(t)
    # per-strategy caps: hash/slug blocks use max_block_size, LSH buckets
    # max_bucket_size (mirrors the reference's max-cluster-size guard)
    cap = F.when(
        F.col("band_id").isin("exact", "slug"), F.lit(cfg.max_block_size)
    ).otherwise(F.lit(cfg.max_bucket_size))
    return bands.withColumn("cap", cap)


def _star_edges_for_key(
    members: DataFrame, key: str, reason: str
) -> DataFrame:
    """member→min-id-representative edges for one equality key column.

    groupBy + equi-join, NOT Window.partitionBy(key): the window form
    funnels an entire key group through one task — exactly the 10^6-copy
    hot-key case star edges exist to handle. The groupBy reduces map-side
    (one row per key per partition crosses the shuffle), and the join back
    is AQE-skew-splittable (the hot key's member partition splits, the
    single rep row replicates) or broadcast when the rep table is small.
    (A round-6 experiment unioning both key families through ONE
    groupBy+join measured consistently SLOWER on the 105k-doc e2e —
    per-family subplans it is.)
    """
    reps = members.groupBy(key).agg(F.min("id").alias("_rep"))
    return (
        members.join(reps, on=key)
        .filter(F.col("id") != F.col("_rep"))
        .select(
            F.least("_rep", "id").alias("id_a"),
            F.greatest("_rep", "id").alias("id_b"),
            F.lit("exact").alias("status"),
            F.lit(reason).alias("reason"),
        )
    )


def star_edges(prep: DataFrame, cfg: DedupConfig = DedupConfig()) -> DataFrame | None:
    """(id_a, id_b, status, reason) star edges for the DETERMINISTIC
    key-equality strategies: every member of a content-hash / slug-key
    group links to the group's min-id representative.

    Key equality is transitive, so a group of n docs needs only n-1 edges
    for connected components to recover the full cluster — pair
    ENUMERATION (C(n,2)) is both unnecessary and the thing the bucket cap
    had to truncate. This is the hot-key answer for boilerplate mega-
    clusters (the reference's pathological case, `fuzzycat/__main__.py:
    220-223`): a 10^6-copy template page costs 10^6-1 edges, zero
    verification, no cap, full recall. Caps/salting remain on the
    APPROXIMATE (LSH) strategies, where a bucket collision is a
    hypothesis, not a verdict.

    Mirrors the cascade's rule order: CONTENT_HASH stars are
    unconditional (rule 1 precedes the length screens); SLUG_MATCH stars
    only cover docs the length screens would let through (empty/short
    docs fall to the pairwise cascade's ambiguous statuses, which never
    form edges).
    """
    outs = []
    if "exact" in cfg.strategies:
        outs.append(
            _star_edges_for_key(
                prep.filter(F.col("ch").isNotNull()).select("id", "ch"),
                "ch",
                "CONTENT_HASH",
            )
        )
    if "slug" in cfg.strategies:
        from fuzzycat_spark.operators.verify import SHORT_TOKENS

        members = prep.filter(
            F.col("slug_key").isNotNull() & (F.col("n_tok") >= SHORT_TOKENS)
        )
        deny = _deny(cfg)
        if deny:
            # denylisted slugs never star: a corpus full of "404 not
            # found" pages must not collapse into one SLUG_MATCH cluster
            members = members.filter(~F.col("slug_key").isin(*deny))
        outs.append(
            _star_edges_for_key(members.select("id", "slug_key"), "slug_key", "SLUG_MATCH")
        )
    if not outs:
        return None
    out = outs[0]
    for t in outs[1:]:
        out = out.unionByName(t)
    return out


def candidate_pairs(
    pages: DataFrame,
    cfg: DedupConfig = DedupConfig(),
    prep: DataFrame | None = None,
) -> DataFrame:
    """Candidates from all enabled blocking strategies via ONE shuffle.

    Every strategy is just a (id, band_id, band_hash) generator; unioning
    the band *tables* before a single bucket-capped pair expansion replaces
    per-strategy join+distinct subplans with one shuffle + one distinct:
    same pair set, ~1/3 the stages.

    `prep` is the materialized table from `prepare_pages` — pass it when
    the caller also verifies, so normalization runs once for both phases.
    """
    if prep is None:
        prep = prepare_pages(
            pages, cfg.id_col, cfg.text_col, slug_mode=cfg.slug_mode,
            with_token_hashes="simhash" in cfg.strategies,
        )
    band_strategies = tuple(s for s in cfg.strategies if s != "substring")
    pairs = None
    if band_strategies:
        bands = strategy_band_table(
            prep, replace(cfg, strategies=band_strategies), pages=pages
        )
        if cfg.salt_hot:
            from fuzzycat_spark.operators.lsh import salt_hot_buckets

            bands = salt_hot_buckets(bands, "cap", cfg.salt_hot)
        pairs = lsh_candidate_pairs(bands, max_bucket_size="cap")
    if "substring" in cfg.strategies:
        from fuzzycat_spark.operators.substring import exact_substring_pairs

        ss = exact_substring_pairs(
            pages,
            cfg.id_col,
            cfg.text_col,
            k=cfg.substring_k,
            max_bucket_size=cfg.max_bucket_size,
            slug_mode=cfg.slug_mode,
        ).select(
            F.least(F.col("id_in"), F.col("id_of")).alias("id_a"),
            F.greatest(F.col("id_in"), F.col("id_of")).alias("id_b"),
        )
        pairs = ss.distinct() if pairs is None else pairs.unionByName(ss).distinct()
    if pairs is None:
        raise ValueError(f"no blocking strategies enabled: {cfg.strategies}")
    return pairs


def dedup_stages(
    pages: DataFrame,
    cfg: DedupConfig,
    stage,
    cc_checkpointer=None,
) -> dict[str, DataFrame]:
    """THE flagship dedup plan, parameterized over stage materialization —
    the single source of truth shared by `dedup_pages` (ephemeral
    checkpoints) and `plans.pipeline.run_dedup_pipeline` (named resumable
    checkpoints). `stage(name, build)` must materialize `build()` and
    return the re-read frame; `cc_checkpointer` optionally threads a
    StageCheckpointer into the CC loop so its per-iteration tables land in
    the resumable dir.

    Plan shape (see the stage comments below): one materialized narrow
    preparation feeds blocking AND verification; deterministic key-equality
    strategies (exact hash, slug) link via O(n) star edges — no pair
    enumeration, no cap, full recall on boilerplate mega-clusters
    (`star_edges`; the reference's max-cluster-size drop, verify.py:130-131,
    is exactly what the stars replace); only the APPROXIMATE strategies go
    through capped pair expansion + the verify cascade, with the embedding
    cosine tier ahead of the text rules when enabled.

    Returns {"prepared", "candidates" (None when only key-equality
    strategies are enabled), "verified", "assignments"}.
    """
    # narrow projection: no html/text payload past here (SURVEY §4's
    # "shuffle only verify columns"); the simhash strategy additionally
    # fingerprints off the prep token hashes, so raw text is scanned once
    prep = stage(
        "prepared",
        lambda: prepare_pages(
            pages, cfg.id_col, cfg.text_col, slug_mode=cfg.slug_mode,
            with_token_hashes="simhash" in cfg.strategies,
        ),
    )
    stars = star_edges(prep, cfg)
    near_cfg = replace(
        cfg,
        strategies=tuple(s for s in cfg.strategies if s not in ("exact", "slug")),
    )
    cands = None
    verified_near = None
    if near_cfg.strategies:
        # materialize candidates before the feature joins: with the lazy
        # window+join+distinct plan inline, the verify joins get planned
        # without row statistics and run ~5x slower
        cands = stage("candidates", lambda: candidate_pairs(pages, near_cfg, prep=prep))
        if "embedding" in cfg.strategies and cfg.embedding_col is not None:
            # embedding tier BEFORE the text cascade: paraphrase dups have
            # dissimilar text by definition, so the text rules would
            # refuse them — cosine >= embedding_strong is the verdict,
            # and only the unresolved remainder pays the text joins
            from fuzzycat_spark.operators.knn import cosine_col

            emb = pages.select(
                F.col(cfg.id_col).alias("id"), F.col(cfg.embedding_col).alias("e")
            )

            def build_emb_pairs() -> DataFrame:
                scored = (
                    cands.join(
                        emb.select(F.col("id").alias("id_a"), F.col("e").alias("_ea")),
                        on="id_a",
                    )
                    .join(
                        emb.select(F.col("id").alias("id_b"), F.col("e").alias("_eb")),
                        on="id_b",
                    )
                    .select(
                        "id_a",
                        "id_b",
                        F.round(cosine_col(F.col("_ea"), F.col("_eb")), 9).alias("_cos"),
                    )
                )
                return scored.filter(F.col("_cos") >= cfg.embedding_strong).select(
                    "id_a",
                    "id_b",
                    F.lit("strong").alias("status"),
                    F.lit("EMBEDDING_COSINE").alias("reason"),
                )

            emb_pairs = stage("emb_pairs", build_emb_pairs)
            rest = cands.join(
                emb_pairs.select("id_a", "id_b"), on=["id_a", "id_b"], how="left_anti"
            )
            verified_near = verify_pairs(
                rest, prep, denylist_keys=_deny(cfg)
            ).unionByName(emb_pairs)
        else:
            verified_near = verify_pairs(cands, prep, denylist_keys=_deny(cfg))
    canon = None
    if cfg.canonical_col:
        from fuzzycat_spark.functions.urls import canonical_link_pairs

        # publisher-declared edges ride the same union as the stars: two
        # narrow projections + one N:1 key join, no text, no cap needed
        # (the join fans IN to the canonical target)
        canon = canonical_link_pairs(
            pages,
            id_col=cfg.id_col,
            url_col=cfg.canonical_url_col or cfg.id_col,
            canonical_col=cfg.canonical_col,
        ).select(
            F.least("id", "canonical_id").alias("id_a"),
            F.greatest("id", "canonical_id").alias("id_b"),
            F.lit("exact").alias("status"),
            F.lit("CANONICAL_LINK").alias("reason"),
        )
    # union star + canonical + verified pairs, one row per pair with the
    # cascade's precedence (CONTENT_HASH < SLUG_MATCH < pairwise verdict);
    # materialize: connected components iterates over the edge list, and
    # without a checkpoint every CC action would re-run blocking+verify
    # (on a cluster this is the Iceberg stage checkpoint)
    parts = [p for p in (stars, canon, verified_near) if p is not None]
    if not parts:
        raise ValueError(f"no blocking strategies enabled: {cfg.strategies}")

    def build_verified() -> DataFrame:
        unioned = parts[0]
        for p in parts[1:]:
            unioned = unioned.unionByName(p)
        # CANONICAL_LINK gets an explicit rank: like CONTENT_HASH it is
        # text-independent (a publisher declaration), so it must outrank
        # any cascade verdict — without a rank it tied at the bottom and
        # the alphabetical tiebreak let a BLACKLISTED verdict on the same
        # pair silently drop the declared edge
        prio = (
            F.when(F.col("reason") == "CONTENT_HASH", 0)
            .when(F.col("reason") == "SLUG_MATCH", 1)
            .when(F.col("reason") == "CANONICAL_LINK", 2)
            .otherwise(3)
        )
        # min(packed string) instead of a row_number window: same winner
        # per pair — (prio, reason, status) packed with a ' ' separator
        # compares lexicographically exactly like the tuple (the separator
        # sorts below every identifier character, and reason → status is a
        # function, so this ≡ the old (prio, reason) window order) — but
        # an aggregate does map-side partial aggregation (duplicate
        # verdicts collapse BEFORE the exchange), and a STRING min stays a
        # HashAggregate where a struct min falls back to SortAggregate and
        # reintroduces the per-partition sorts (measured ~1 s on the
        # 105k-doc e2e).
        packed = F.concat_ws(
            " ", prio.cast("string"), F.col("reason"), F.col("status")
        )
        sp = F.split(F.col("_b"), " ")
        return (
            unioned.groupBy("id_a", "id_b")
            .agg(F.min(packed).alias("_b"))
            .select(
                "id_a",
                "id_b",
                sp.getItem(2).alias("status"),
                sp.getItem(1).alias("reason"),
            )
        )

    verified = stage("verified", build_verified)

    def build_assignments() -> DataFrame:
        edges = verified.filter(F.col("status").isin(*cfg.edge_statuses))
        cc = connected_components(edges, checkpointer=cc_checkpointer)
        # id universe from the PREP checkpoint, not the raw pages: prep is
        # row-for-row with the input (pure projections, no filter), so the
        # id multiset is identical — and reading one narrow column of the
        # feature parquet replaces a second full scan of the text corpus
        # (column pruning cannot reach an opaque/localCheckpointed source).
        return (
            prep.select("id")
            .join(cc, on="id", how="left")
            .select(
                "id", F.coalesce(F.col("cluster_id"), F.col("id")).alias("cluster_id")
            )
        )

    assignments = stage("assignments", build_assignments)
    return {
        "prepared": prep,
        "candidates": cands,
        "verified": verified,
        "assignments": assignments,
    }


# stages every caller must hard-materialize (plan-statistics / lineage-cut
# boundaries); "prepared" checkpoints inside prepare_pages itself and
# "assignments" is terminal, so the ephemeral path skips re-writing those.
# "verified" is soft here: its only in-pipeline consumer is connected
# components, whose own first checkpoint write materializes the filtered
# edge set — a second eager write of the full verdict table cost ~2s per
# 105k-doc run and bought nothing (the tier tables inside verify_pairs are
# parquet-backed, so recompute-on-action for a caller reading the returned
# verified frame is a cheap union over checkpoints, not a re-verify). The
# durable CLI path (plans.pipeline) still names and checkpoints every
# stage, including verified.
HARD_STAGES = frozenset({"candidates", "emb_pairs"})


def dedup_pages(
    pages: DataFrame, cfg: DedupConfig = DedupConfig()
) -> tuple[DataFrame, DataFrame]:
    """Run the full pipeline with ephemeral (session-temp) checkpoints.

    Returns (verified_pairs, assignments):
      verified_pairs — (id_a, id_b, status, reason), id_a < id_b
      assignments    — (id, cluster_id); singletons get their own id,
                       cluster_id = min id in the component (FIXTURES.md §5).

    The plan is `dedup_stages` — byte-identical to what the spark-submit
    path (`plans.pipeline.run_dedup_pipeline`) runs, minus the durable
    checkpoint dir (pinned by tests/test_dedup_e2e.py's CLI parity test).
    """

    def stage(name: str, build) -> DataFrame:
        df = build()
        return materialize(df, name) if name in HARD_STAGES else df

    out = dedup_stages(pages, cfg, stage)
    return out["verified"], out["assignments"]


def dup_stats(assignments: DataFrame) -> DataFrame:
    """Cluster-size histogram + dup-rate — the reference's summary metrics
    (`notes/2020_11_testruns.md:58-82`, `notes/old_pipeline.md:119`)."""
    sizes = assignments.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    ).orderBy("cluster_size")


def select_canonical(
    pages: DataFrame,
    assignments: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """One kept representative per duplicate cluster — the corpus-emitting
    end of the pipeline (what a training-data run actually writes out).
    The reference keeps whichever record sorts first in the cluster slab
    (`cluster.py`'s sorted key groups); here the keep rule is explicit:
    highest quality score, ties broken by min id, so the choice is
    deterministic and independent of partitioning.

    `assignments` is `dedup_pages`/`dedup_stages` output (id, cluster_id);
    `quality_col` names a precomputed [0,1] column on `pages`, else the
    native `quality_score_cols` blend is computed on the fly (pure
    Catalyst, no Python).

    Returns (cluster_id, canonical_id, n_members, quality) — one row per
    cluster, `quality` rounded to 6 so cross-engine comparisons are exact.

    Scale: one narrow projection of pages (id + one double), one shuffle
    to join assignments on id, one shuffle for the per-cluster window.
    Singleton clusters (the overwhelming majority of a web corpus)
    cost one window row each; no skew concern because the window state is
    a row counter, not a buffer: row_number streams within each partition.
    """
    from pyspark.sql.window import Window

    from fuzzycat_spark.functions.text import quality_score_cols

    if quality_col is None:
        q = F.round(quality_score_cols(text_col)["quality"], 6)
    else:
        q = F.round(F.col(quality_col).cast("double"), 6)
    scored = pages.select(F.col(id_col).alias("id"), q.alias("quality")).join(
        assignments, on="id"
    )
    w = Window.partitionBy("cluster_id")
    wo = w.orderBy(F.col("quality").desc(), F.col("id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(wo))
        .withColumn("n_members", F.count(F.lit(1)).over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col("id").alias("canonical_id"),
            "n_members",
            "quality",
        )
    )


def dedup_corpus(
    pages: DataFrame, cfg: DedupConfig = DedupConfig()
) -> DataFrame:
    """End-to-end corpus dedup: run the flagship pipeline, keep one
    best-quality page per cluster, return the kept pages with their
    cluster metadata (original schema + cluster_id + n_members). The
    left-semi shape keeps the full-width page payload out of every
    shuffle except the final keep join."""
    _, assignments = dedup_pages(pages, cfg)
    keep = select_canonical(pages, assignments, cfg.id_col, cfg.text_col)
    return pages.join(
        keep.select(
            F.col("canonical_id").alias(cfg.id_col), "cluster_id", "n_members"
        ),
        on=cfg.id_col,
    )
