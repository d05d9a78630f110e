"""spark-submit entrypoint for the FULL training-corpus pipeline: crawl
pages in, training shards out. Composes the engine end to end —

    ingest (parquet/Iceberg/jsonl or raw WARC + html→text extraction)
    → admission filter (tokens/quality/repetition/denylist, script-aware)
    → optional recrawl delta screen (--previous-crawl: unchanged pages skip)
    → optional PII redaction, optional cross-doc line dedup
    → optional host-centrality screen (PageRank over the crawl's own
      link graph, --min-host-centrality)
    → optional learned quality filter (--quality-weights: pinned linear
      classifier over hashed n-gram features)
    → optional corpus-LM fluency floor (--min-lm-score) and/or
      CCNet head/middle/tail perplexity tiers (--lm-bucket-keep)
    → dedup (full multi-strategy blocking + verify + components)
    → canonical selection (one best page per cluster)
    → optional cross-corpus screen (--reference-corpus: drop pages
      near-matching a frozen prior corpus; --emit-bands persists this
      run's band table for the next crawl's --reference-bands)
    → optional eval-suite decontamination
    → optional per-domain caps
    → optional per-language budget mixing
    → reproducible training shards

Usage:
    spark-submit --py-files dist/fuzzycat_spark.zip jobs/corpus_job.py \
        --input <pages parquet/table/warc glob> --output <shards dir> \
        --checkpoint <resumable stage dir> [--input-format warc] \
        [--mix-budgets '{"en": 2.5e9}'] [--max-per-domain 1000] \
        [--eval-path <eval parquet>] [--pii] [--strip-common-lines] \
        [--eval-embeddings <eval vecs> --doc-embeddings <corpus vecs> \
         [--semantic-ann --embedding-dim N]]

Every stage checkpoints via StageCheckpointer (per-partition lineage +
counters in the manifest); re-running with the same --checkpoint resumes
after the last completed stage. The dedup core is the SAME
`dedup_stages` composition the flagship and `jobs/dedup_job.py` run.

Reference analog: fuzzycat's cluster → verify CLI steps end at verified
cluster slabs (`notes/old_pipeline.md`); this job continues to what a
training run actually consumes.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def admission_filter(
    pages: DataFrame,
    text_col: str = "text",
    min_tokens: int = 5,
    min_quality: float = 0.3,
    min_chars_non_latin: int = 20,
    repetition: bool = True,
) -> DataFrame:
    """Script-aware keep decision, all pure Catalyst: Latin-script docs
    pass token/quality/repetition thresholds; non-Latin docs (the quality
    blend is Latin-trained) pass a codepoint-length screen + repetition;
    denylisted boilerplate slugs drop regardless."""
    from fuzzycat_spark.functions.denylist import WEB_BOILERPLATE_DENYLIST
    from fuzzycat_spark.functions.normalize import slug_text
    from fuzzycat_spark.functions.repetition import repetition_keep
    from fuzzycat_spark.functions.text import NON_LATIN_SCRIPTS, script_of
    from fuzzycat_spark.functions.text import quality_score_cols

    q = quality_score_cols(text_col)
    script = script_of(F.col(text_col))
    latin_ok = (q["n_tokens"] >= min_tokens) & (q["quality"] >= min_quality)
    non_latin_ok = script.isin(*NON_LATIN_SCRIPTS) & (
        F.length(text_col) >= min_chars_non_latin
    )
    keep = (latin_ok | non_latin_ok) & ~slug_text(text_col).isin(
        *WEB_BOILERPLATE_DENYLIST
    )
    if repetition:
        keep = keep & repetition_keep(text_col)
    return pages.filter(keep)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--input-format", default="table", choices=("table", "warc"),
        help="table: parquet/Iceberg/jsonl of pages; warc: raw crawl "
        "archives, html→text extracted here",
    )
    p.add_argument("--id-col", default="url")
    p.add_argument("--text-col", default="text")
    p.add_argument("--strategies", default="exact,slug,minhash")
    p.add_argument("--slug-mode", default="auto",
                   choices=("ascii", "unicode", "auto"))
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--no-repetition-filter", action="store_true")
    p.add_argument("--pii", action="store_true",
                   help="redact email/card/IPv6/IPv4/phone in the text")
    p.add_argument("--fix-encoding", action="store_true",
                   help="repair UTF-8-as-cp1252 mojibake before anything "
                   "keys or filters on the text")
    p.add_argument("--c4-clean", action="store_true",
                   help="C4 §2.2 hygiene: rewrite the text to its "
                   "terminal-punctuated >=5-word non-javascript lines and "
                   "drop lorem-ipsum/curly-brace/<3-sentence pages")
    p.add_argument("--gopher-rules", action="store_true",
                   help="drop pages failing any Gopher A1 non-repetition "
                   "rule (word count/length, symbols, bullets, ellipses, "
                   "alpha words, stopwords); composes with the default "
                   "repetition filter for the full suite")
    p.add_argument("--min-host-centrality", type=int, default=0, metavar="FP",
                   help="compute fixed-point PageRank over the crawl's own "
                        "host link graph (scale 1e9; a host nobody links to "
                        "scores the teleport base 150000000) and drop pages "
                        "whose host scores below FP; kept pages gain a "
                        "host_centrality column (0 disables)")
    p.add_argument("--collapse-revisits", default=None, metavar="TS_COL",
                   help="collapse crawl revisits BEFORE any text stage: "
                        "keep one row per canonical SURT key — the newest "
                        "TS_COL snapshot, timestamp ties to lowest id "
                        "(functions/urls.latest_revision); on a recrawled "
                        "corpus this stops revisit pairs from ever "
                        "reaching dedup")
    p.add_argument("--drop-crawler-traps", type=int, default=0,
                   metavar="MIN_URLS",
                   help="drop every page of a (host, digit-template) URL "
                        "family with >= MIN_URLS distinct canonical URLs "
                        "but <= half as many distinct contents (infinite "
                        "calendars, faceted search); 0 disables")
    p.add_argument("--min-host-quality", type=int, default=0, metavar="FP",
                   help="drop WHOLE hosts whose mean page quality (1e6 "
                        "fixed point, exact integer mean) is below FP "
                        "(e.g. 600000 = 0.6); 0 disables")
    p.add_argument("--min-host-docs", type=int, default=1,
                   help="with --min-host-quality: also drop hosts with "
                        "fewer than this many pages")
    p.add_argument("--min-lm-score", type=int, default=0, metavar="FP",
                   help="CCNet-style fluency floor: score every page under "
                        "the corpus's own bigram LM (integer fixed point, "
                        "scale 1e9) and drop pages whose mean token "
                        "probability falls below FP; kept pages gain a "
                        "lm_mean_p column (0 disables). Docs with <2 tokens "
                        "score NULL and are dropped when the floor is on")
    p.add_argument("--lm-bucket-keep", default="", metavar="TIERS",
                   help="CCNet perplexity tiers: bucket every page into "
                        "head/middle/tail by corpus-LM score tertiles "
                        "(cutoffs fitted on a deterministic hash sample, "
                        "see --lm-bucket-sample) and keep only the listed "
                        "comma-separated tiers, e.g. 'head,middle'. Kept "
                        "pages gain lm_mean_p and lm_bucket columns. "
                        "Empty = off; combinable with --min-lm-score")
    p.add_argument("--quality-weights", default=None, metavar="PATH",
                   help="pinned linear-classifier vocabulary parquet "
                        "(h:int64, w_fp:int64 — e.g. fit_nb_weights "
                        "output): score every page over hashed "
                        "unigram+bigram features and drop pages below "
                        "--min-classifier-score; kept pages gain a "
                        "cls_score column (fastText/CCNet-style learned "
                        "quality filter)")
    p.add_argument("--min-classifier-score", type=int, default=0, metavar="FP",
                   help="keep threshold for --quality-weights (fixed "
                        "point 1e6 per nat; NB log-odds weights make 0 "
                        "the 'more target-like than background' line)")
    p.add_argument("--lm-bucket-sample", type=float, default=1.0,
                   help="sample rate for fitting the tier cutoffs "
                        "(default 1.0; at crawl scale use e.g. 0.001 — "
                        "cutoff fitting sorts only the sample)")
    p.add_argument("--previous-crawl", default=None, metavar="PATH",
                   help="pages table of the PREVIOUS run's 'filtered' "
                        "stage (same text flags — the comparison is "
                        "against THIS run's filtered text, so a raw "
                        "prior crawl would read PII-redacted/repaired "
                        "pages as changed): keep only pages that are "
                        "new or whose content changed since (one "
                        "full-outer join over (key, md5) rows — the "
                        "unchanged majority of a recrawl skips the "
                        "whole pipeline)")
    p.add_argument("--strip-common-lines", action="store_true",
                   help="C4-style cross-document boilerplate line removal")
    p.add_argument("--min-line-docs", type=int, default=2)
    p.add_argument("--strip-dup-spans", type=int, default=0, metavar="K",
                   help="remove corpus-duplicated token spans of length "
                   ">= K from the kept corpus (Lee et al. ExactSubstr); "
                   "0 = off. Runs AFTER canonical selection — before it, "
                   "whole-document duplicates would erase each other's "
                   "entire text")
    p.add_argument("--pack-seq-len", type=int, default=0, metavar="B",
                   help="annotate each doc with its concatenate-and-chunk "
                   "packing layout (start_off/start_seq/end_seq per "
                   "B-token training sequence, per shard); 0 = off")
    p.add_argument("--emit-sketches", action="store_true",
                   help="persist LogLog distinct-token registers and a "
                        "count-min term-frequency sketch of the kept "
                        "corpus (fixed-size, mergeable across crawls)")
    p.add_argument("--emit-postings", action="store_true",
                   help="emit the kept corpus's (id, term-hash, tf, dl) "
                        "posting table as a side artifact under the "
                        "checkpoint dir — the persisted terms= input of "
                        "lexical_topk/bm25_topk (build once, query many "
                        "times)")
    p.add_argument("--vocab-top-k", type=int, default=0, metavar="K",
                   help="emit the kept corpus's K most frequent tokens "
                   "as a side table under the checkpoint dir; 0 = off")
    p.add_argument("--bpe-merges", type=int, default=0, metavar="N",
                   help="learn an N-merge BPE tokenizer over the kept "
                        "corpus and persist the merge table as a side "
                        "artifact (the model operators/bpe.bpe_apply "
                        "folds over any future corpus); 0 = off")
    p.add_argument("--reference-corpus", default=None, metavar="PATH",
                   help="frozen reference corpus (same id/text columns; "
                        "e.g. the previous run's --output shards): after "
                        "canonical selection, drop every kept page whose "
                        "shingle Jaccard against ANY reference page "
                        "reaches --cross-jaccard. The asymmetric 'dedup "
                        "crawl N against crawl N-1' screen — within-"
                        "reference pairs are never expanded")
    p.add_argument("--cross-jaccard", type=float, default=0.5,
                   help="confirmation threshold for --reference-corpus")
    p.add_argument("--reference-bands", default=None, metavar="PATH",
                   help="persisted (id, band_id, band_hash) MinHash band "
                        "table of the reference corpus (a prior run's "
                        "'bands' side artifact): skips re-hashing the "
                        "frozen side on every incoming crawl")
    p.add_argument("--emit-bands", action="store_true",
                   help="emit the kept corpus's MinHash band table as a "
                        "side artifact under the checkpoint dir — the "
                        "--reference-bands input of the NEXT crawl's run")
    p.add_argument("--seen-bloom", default=None, metavar="PATH",
                   help="Bloom filter parquet (word, bits) of ids kept by "
                        "prior crawls (a previous run's 'bloom' artifact, "
                        "or several merged with bloom_merge): pages whose "
                        "id MAY be in the filter are dropped before any "
                        "expensive stage. Never drops by false negative; "
                        "drops new pages at the filter's false-positive "
                        "rate — size --bloom-m-bits for the tolerated "
                        "loss. O(m/32) rows where --previous-crawl ships "
                        "the full prior key table")
    p.add_argument("--emit-bloom", action="store_true",
                   help="emit the Bloom filter of the kept corpus's ids "
                        "as a side artifact under the checkpoint dir — "
                        "the --seen-bloom input of later crawls")
    p.add_argument("--bloom-m-bits", type=int, default=1 << 24,
                   help="Bloom filter size in bits (default 2^24); must "
                        "match between the emitting and screening runs")
    p.add_argument("--bloom-d", type=int, default=3,
                   help="Bloom hash count; must match between runs")
    p.add_argument("--eval-path", default=None,
                   help="eval-suite parquet (text col) to decontaminate against")
    p.add_argument("--eval-ngram", type=int, default=8)
    p.add_argument("--eval-embeddings", default=None, metavar="PATH",
                   help="eval-suite EMBEDDINGS parquet (--eval-id-col + "
                        "--vec-col) for the semantic screen: drops kept docs "
                        "whose embedding sits within --semantic-threshold "
                        "cosine of any eval vector (paraphrased benchmark "
                        "leakage exact n-grams miss); requires "
                        "--doc-embeddings")
    p.add_argument("--doc-embeddings", default=None, metavar="PATH",
                   help="corpus embeddings parquet keyed by --id-col; docs "
                        "without an embedding row are kept (screen can only "
                        "judge embedded docs)")
    p.add_argument("--eval-id-col", default="eval_id")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--semantic-threshold", type=float, default=0.9)
    p.add_argument("--semantic-ann", action="store_true",
                   help="use the LSH-bucketed scale path (capped corpus-side "
                        "hyperplane buckets) instead of the exact broadcast "
                        "screen; requires --embedding-dim")
    p.add_argument("--embedding-dim", type=int, default=0)
    p.add_argument("--semantic-planes", type=int, default=8)
    p.add_argument("--max-per-domain", type=int, default=0,
                   help="0 = no per-domain cap")
    p.add_argument("--mix-budgets", default=None,
                   help='JSON {"lang": char_budget}; requires a lang column')
    p.add_argument("--mix-seed", type=int, default=0)
    p.add_argument("--flatten-budget", type=int, default=0, metavar="N",
                   help="square-root temperature flattening: keep an "
                        "expected N docs total with per-lang shares "
                        "proportional to sqrt(count) (UniMax/mT5 T=2); "
                        "rates clamp at 1, so tail langs are never "
                        "up-sampled. Requires a lang column; mutually "
                        "exclusive with --mix-budgets; 0 = off")
    p.add_argument("--token-budgets", default=None, metavar="JSON",
                   help='JSON {"lang": token_budget}: keep the HIGHEST-'
                        "quality docs per lang until the budget fills "
                        "(ranked selection, not a uniform draw); requires "
                        "a lang column; mutually exclusive with "
                        "--mix-budgets/--flatten-budget")
    p.add_argument("--use-canonical", action="store_true",
                   help="extract <link rel=canonical> hrefs from the html "
                        "column and feed them to dedup as publisher-"
                        "declared ('exact', CANONICAL_LINK) edges — "
                        "AMP/print/session variants cluster with zero "
                        "text comparison")
    p.add_argument("--robots", default=None, metavar="PATH",
                   help="robots.txt parquet (host, robots_txt): drop pages "
                        "whose URL a User-agent:* rule disallows "
                        "(longest-prefix match, Allow wins ties) before any "
                        "other stage — the site-level opt-out next to "
                        "--honor-noindex's in-page one")
    p.add_argument("--honor-noindex", action="store_true",
                   help="drop pages whose <meta name=robots> declares "
                        "noindex (or none) — the publisher's opt-out; "
                        "needs an html column (WARC input keeps one)")
    p.add_argument("--splits", default=None, metavar="JSON",
                   help='JSON {"train": 0.9, "val": 0.05, "test": 0.05}: '
                        "stamp a leakage-safe split column routed by the "
                        "md5 draw of each doc's DEDUP CLUSTER label, so a "
                        "near-duplicate family can never straddle a split "
                        "boundary and splits survive a rerun that picks a "
                        "different canonical representative")
    p.add_argument("--split-seed", type=int, default=0)
    p.add_argument("--screen-train-overlap", type=int, default=0,
                   metavar="N",
                   help="after --splits: drop TRAIN docs sharing an exact "
                        "word N-gram with any held-out doc (val/test keep "
                        "their size; the model never trains on their "
                        "content); 0 = off, requires --splits")
    p.add_argument("--n-shards", type=int, default=64)
    p.add_argument("--shard-seed", type=int, default=0)
    p.add_argument("--export-jsonl", metavar="DIR", default=None,
                   help="also emit the kept corpus as compressed JSONL "
                        "shards (loader-facing twin of the parquet "
                        "shards; same seed/placement/order) plus a "
                        "DIR/_manifest parquet of per-shard integrity "
                        "hashes")
    args = p.parse_args()
    if args.flatten_budget > 0 and args.mix_budgets:
        p.error("--flatten-budget and --mix-budgets are mutually exclusive")
    if args.token_budgets and (args.flatten_budget > 0 or args.mix_budgets):
        p.error(
            "--token-budgets is mutually exclusive with "
            "--mix-budgets/--flatten-budget"
        )
    if args.eval_embeddings and not args.doc_embeddings:
        p.error("--eval-embeddings requires --doc-embeddings (the corpus "
                "side of the cosine screen)")
    if args.semantic_ann and args.embedding_dim <= 0:
        p.error("--semantic-ann requires --embedding-dim (hyperplane "
                "generation is dimension-specific)")
    if args.reference_bands and not args.reference_corpus:
        p.error("--reference-bands only takes effect with "
                "--reference-corpus (the screen needs the reference "
                "texts for exact-Jaccard confirmation)")
    if args.screen_train_overlap > 0 and not args.splits:
        p.error("--screen-train-overlap needs --splits (the screen "
                "compares the stamped train split against held-out docs)")
    if args.screen_train_overlap > 0 and "train" not in json.loads(args.splits):
        # train_overlap_screen filters split == "train"; with custom
        # split names the train side would be empty and the screen a
        # silent no-op while the operator believes decontamination ran.
        p.error('--screen-train-overlap needs a split literally named '
                '"train" in --splits (the screen drops train-side docs '
                'overlapping any other split)')

    from fuzzycat_spark.functions.pii import redact_pii
    from fuzzycat_spark.operators.dedup import DedupConfig, select_canonical
    from fuzzycat_spark.operators.decontaminate import decontaminate
    from fuzzycat_spark.operators.domains import domain_cap
    from fuzzycat_spark.operators.lines import strip_common_lines
    from fuzzycat_spark.operators.mixing import mix_corpus
    from fuzzycat_spark.operators.sharding import write_training_shards
    from fuzzycat_spark.plans.checkpoint import StageCheckpointer
    from fuzzycat_spark.plans.pipeline import run_dedup_pipeline
    from fuzzycat_spark.sources.tables import read_pages

    spark = SparkSession.builder.appName("fuzzycat-spark-corpus").getOrCreate()
    ck = StageCheckpointer(spark, args.checkpoint)
    idc, txt = args.id_col, args.text_col

    def ingest() -> DataFrame:
        if args.input_format == "warc":
            from fuzzycat_spark.sources.html_extract import extract_text_udf
            from fuzzycat_spark.sources.warc import warc_pages

            raw = warc_pages(spark, args.input)
            # only markup reaches the extractor (images/octet-streams are
            # the multimodal path); bytes decode INSIDE the pandas UDF —
            # a JVM binary→string cast can emit strings Arrow refuses to
            # convert back for non-UTF-8 payloads
            return raw.filter(
                F.col("content_type").startswith("text/html")
                | F.col("content_type").startswith("application/xhtml")
            ).select(
                F.col("url").alias(idc),  # the record URL is the id
                "warc_ts", "html",
                extract_text_udf(F.col("html")).alias(txt),
            )
        return read_pages(spark, args.input)

    # 1. ingest + admission (+ optional hygiene) — one checkpointed table
    def filtered() -> DataFrame:
        raw = ingest()
        if args.robots:
            from fuzzycat_spark.operators.robots import (
                robots_decisions,
                robots_rules,
            )

            # the site-level opt-out screens FIRST, before even the
            # in-page directive scan: a disallowed URL must not reach
            # any downstream stage, score, or sketch
            rules = robots_rules(spark.read.parquet(args.robots))
            allowed = (
                robots_decisions(raw.select(idc), rules, url_col=idc)
                .filter(F.col("allowed"))
                .select(F.col("url").alias(idc))
            )
            raw = raw.join(allowed, on=idc, how="left_semi")
        if args.honor_noindex or args.use_canonical:
            from fuzzycat_spark.sources.html_extract import (
                page_directives_udf,
            )

            if "html" not in raw.columns:
                raise SystemExit(
                    "--honor-noindex/--use-canonical need an html column "
                    "in the input (WARC ingest keeps one); robots and "
                    "canonical directives live in markup, not extracted "
                    "text"
                )
            # ONE directive scan serves both arms
            raw = raw.withColumn(
                "_dir", page_directives_udf(F.col("html"))
            )
            if args.honor_noindex:
                # the opt-out screens FIRST: a noindex'd page must not
                # reach any downstream stage, score, or sketch
                raw = raw.filter(~F.col("_dir.noindex"))
            if args.use_canonical:
                raw = raw.withColumn("canonical", F.col("_dir.canonical"))
            raw = raw.drop("_dir")
        if args.collapse_revisits:
            from fuzzycat_spark.functions.urls import latest_revision

            # URL-level first: one (id, ts) winner per canonical key,
            # joined back on BOTH columns so older snapshots of the same
            # URL leave too (id alone would readmit them)
            winners = latest_revision(
                raw, url_col=idc, ts_col=args.collapse_revisits, id_col=idc
            ).select(
                F.col("id").alias(idc),
                F.col(args.collapse_revisits),
            )
            raw = raw.join(
                winners, on=[idc, args.collapse_revisits], how="left_semi"
            )
        if args.fix_encoding:
            from fuzzycat_spark.functions.encoding import fix_mojibake

            # repair FIRST: damaged bytes would otherwise fragment slugs,
            # shingles, and the admission scores
            raw = raw.withColumn(txt, fix_mojibake(txt))
        if args.c4_clean:
            from fuzzycat_spark.functions.webfilters import c4_clean_cols

            # clean BEFORE admission so scores judge the text that will
            # actually ship; page verdict first, then the line rewrite
            cc = c4_clean_cols(txt)
            raw = raw.filter(cc["keep"]).withColumn(txt, cc["text_clean"])
        pages = admission_filter(
            raw, txt,
            min_tokens=args.min_tokens,
            min_quality=args.min_quality,
            repetition=not args.no_repetition_filter,
        )
        if args.gopher_rules:
            from fuzzycat_spark.functions.webfilters import gopher_rule_cols

            pages = pages.filter(gopher_rule_cols(txt)["keep"])
        if args.strip_common_lines:
            pages = strip_common_lines(
                pages, id_col=idc, text_col=txt, min_docs=args.min_line_docs
            )
        if args.pii:
            pages = pages.withColumn(txt, redact_pii(txt))
        return pages

    pages = ck.stage("filtered", filtered)

    # 1a. optional recrawl delta: drop pages unchanged since the previous
    # crawl BEFORE any expensive stage — on a weekly recrawl the
    # unchanged majority never re-enters dedup. Runs after admission so
    # the delta join carries only admitted keys.
    if args.previous_crawl:
        from fuzzycat_spark.operators.delta import crawl_delta

        def delta_screened() -> DataFrame:
            prev = read_pages(spark, args.previous_crawl)
            keep = (
                crawl_delta(prev, pages, key_col=idc, text_col=txt)
                .filter(F.col("status").isin("added", "changed"))
                .select(F.col("key").alias(idc))
            )
            return pages.join(keep, on=idc, how="left_semi")

        pages = ck.stage("delta_screened", delta_screened)

    # 1a'. optional seen-id Bloom screen: the O(1)-sized alternative to
    # --previous-crawl when only "was this id kept before?" matters —
    # the filter never false-negatives (genuinely unseen pages always
    # pass), and drops unseen pages only at its designed false-positive
    # rate. The filter rides one broadcast; the corpus side is d integer
    # probe rows per page.
    if args.seen_bloom:
        from fuzzycat_spark.operators.sketch import bloom_contains

        def bloom_screened() -> DataFrame:
            bloom = spark.read.parquet(args.seen_bloom)
            verdict = bloom_contains(
                bloom, pages.select(idc), idc,
                m_bits=args.bloom_m_bits, d=args.bloom_d,
            )
            keep = verdict.filter(~F.col("may_contain")).select(idc)
            return pages.join(keep, on=idc, how="left_semi")

        pages = ck.stage("bloom_screened", bloom_screened)

    # 1b. optional host-centrality screen: PageRank over the crawl's own
    # link graph, BEFORE dedup — spam farms leave both the corpus and the
    # candidate space. Hosts absent from the graph score the teleport
    # base (exactly the no-inlink fixed point), never NULL.
    if args.min_host_centrality > 0:
        from fuzzycat_spark.functions.urls import surt_host
        from fuzzycat_spark.operators.linkgraph import (
            extract_links,
            host_graph,
            pagerank_fp,
            teleport_base,
        )

        if "html" not in pages.columns:
            raise SystemExit(
                "--min-host-centrality needs an html column in the input "
                "(links are extracted from markup, not extracted text)"
            )

        def host_scores() -> DataFrame:
            return pagerank_fp(host_graph(extract_links(pages, url_col=idc)))

        hs = ck.stage("host_scores", host_scores)

        def host_filtered() -> DataFrame:
            return (
                pages.withColumn("_host", surt_host(F.col(idc)))
                .join(
                    hs.select(F.col("host").alias("_host"), "score_fp"),
                    on="_host",
                    how="left",
                )
                .withColumn(
                    "host_centrality",
                    F.coalesce("score_fp", F.lit(teleport_base())),
                )
                .drop("_host", "score_fp")
                .filter(F.col("host_centrality") >= args.min_host_centrality)
            )

        pages = ck.stage("host_filtered", host_filtered)

    if args.drop_crawler_traps > 0:
        # 1b1a. URL-family trap screen: the trap table is (host,
        # template)-sized and broadcasts; pages pay one left-anti join
        def trap_screened() -> DataFrame:
            from fuzzycat_spark.functions.urls import (
                crawler_traps,
                surt_host,
                url_template,
            )

            traps = (
                crawler_traps(
                    pages.select(
                        F.col(idc).alias("url"), F.col(txt).alias("text")
                    ),
                    min_urls=args.drop_crawler_traps,
                )
                .filter(F.col("is_trap"))
                .select("host", "template")
            )
            keyed = pages.withColumn(
                "_trap_host", surt_host(F.col(idc))
            ).withColumn("_trap_tpl", url_template(F.col(idc)))
            return keyed.join(
                F.broadcast(traps),
                on=(keyed["_trap_host"] == traps["host"])
                & (keyed["_trap_tpl"] == traps["template"]),
                how="left_anti",
            ).drop("_trap_host", "_trap_tpl")

        pages = ck.stage("trap_screened", trap_screened)

    if args.min_host_quality > 0:
        # 1b1b. host-level quality: drop WHOLE sites whose mean page
        # quality (exact fixed point) falls under the floor — content
        # farms leak through page-level thresholds via their long tail
        def host_quality_filtered() -> DataFrame:
            from fuzzycat_spark.functions.urls import surt_host
            from fuzzycat_spark.operators.domains import host_quality_screen

            return host_quality_screen(
                pages.withColumn("_hq_host", surt_host(F.col(idc))),
                "_hq_host",
                text_col=txt,
                min_mean_quality_fp=args.min_host_quality,
                min_docs=args.min_host_docs,
            ).drop("_hq_host")

        pages = ck.stage("host_quality_filtered", host_quality_filtered)

    # 1b2. optional learned quality filter: integer linear score over
    # hashed n-gram features against a pinned vocabulary, BEFORE dedup —
    # the classic "classify against the reference corpus" stage. One
    # broadcast join + one integer aggregation per page.
    if args.quality_weights:
        from fuzzycat_spark.operators.classify import linear_score_fp

        def classifier_filtered() -> DataFrame:
            w = spark.read.parquet(args.quality_weights)
            scores = linear_score_fp(pages, w, id_col=idc, text_col=txt)
            return pages.join(
                scores.select(F.col("id").alias(idc),
                              F.col("score_fp").alias("cls_score")),
                on=idc,
            ).filter(F.col("cls_score") >= args.min_classifier_score)

        pages = ck.stage("classifier_filtered", classifier_filtered)

    # 1c. optional fluency floor: mean token probability under the
    # corpus's OWN bigram LM (the CCNet move, self-trained instead of
    # Wikipedia-trained; pass a separate model corpus via the library
    # API for the cross-corpus form). Kept BEFORE dedup so garbage
    # never enters the candidate space.
    if args.min_lm_score > 0:
        from fuzzycat_spark.operators.lm import doc_lm_scores

        def lm_filtered() -> DataFrame:
            scores = doc_lm_scores(pages, id_col=idc, text_col=txt)
            return (
                pages.join(
                    scores.select(idc, F.col("mean_p_fp").alias("lm_mean_p")),
                    on=idc,
                )
                .filter(F.col("lm_mean_p") >= args.min_lm_score)
            )

        pages = ck.stage("lm_filtered", lm_filtered)

    # 1d. optional CCNet perplexity tiers: head/middle/tail by score
    # tertiles (cutoffs from the deterministic md5 sample), keep the
    # requested tiers. The authentic CCNet move — relative mass splits
    # instead of an absolute floor — so the same flag works on any
    # corpus without retuning a threshold.
    if args.lm_bucket_keep:
        keep_tiers = tuple(
            t.strip() for t in args.lm_bucket_keep.split(",") if t.strip()
        )
        bad = set(keep_tiers) - {"head", "middle", "tail"}
        if bad:
            raise SystemExit(f"--lm-bucket-keep: unknown tiers {sorted(bad)}")
        if not 0.0 < args.lm_bucket_sample <= 1.0:
            raise SystemExit(
                f"--lm-bucket-sample {args.lm_bucket_sample}: must be in "
                "(0, 1] — 0 would fit cutoffs on an empty sample and "
                "bucket the whole corpus 'tail'"
            )
        if args.lm_bucket_sample >= 1.0:
            import sys as _sys

            print(
                "corpus_job: --lm-bucket-sample 1.0 fits tier cutoffs on "
                "the FULL corpus (a single-task rank over every score) — "
                "fine for pilots, set e.g. 0.001 for crawl-scale runs",
                file=_sys.stderr,
            )
        from fuzzycat_spark.operators.lm import (
            doc_lm_scores,
            lm_perplexity_buckets,
        )

        # score once into a checkpointed table: the bucket operator
        # consumes its input twice (cutoff sample + output join), which
        # would re-fit the corpus LM per branch on a lazy frame
        def lm_score_table() -> DataFrame:
            return doc_lm_scores(pages, id_col=idc, text_col=txt)

        lm_scores_ck = ck.stage("lm_scores", lm_score_table)

        def lm_bucketed() -> DataFrame:
            buckets = lm_perplexity_buckets(
                lm_scores_ck, id_col=idc, sample_rate=args.lm_bucket_sample
            ).select(
                idc,
                F.col("mean_p_fp").alias("lm_mean_p"),
                F.col("bucket").alias("lm_bucket"),
            )
            joined = (
                pages.drop("lm_mean_p") if "lm_mean_p" in pages.columns
                else pages
            ).join(buckets, on=idc)
            return joined.filter(F.col("lm_bucket").isin(*keep_tiers))

        had_pages = pages.limit(1).count() > 0
        pages = ck.stage("lm_bucketed", lm_bucketed)
        if had_pages and pages.limit(1).count() == 0:
            raise SystemExit(
                "--lm-bucket-keep kept ZERO pages: the cutoff sample was "
                "likely empty (sample_rate too small for this corpus) — "
                "every document classified 'tail'. Raise "
                "--lm-bucket-sample or include 'tail' in the kept tiers."
            )

    # 2. dedup core (its own named stages inside the same checkpointer)
    cfg = DedupConfig(
        id_col=idc,
        text_col=txt,
        strategies=tuple(s for s in args.strategies.split(",") if s),
        canonical_col="canonical" if args.use_canonical else None,
        canonical_url_col=idc if args.use_canonical else None,
        slug_mode=args.slug_mode,
    )
    out = run_dedup_pipeline(pages, ck, cfg)

    # 3. one best page per cluster, full payload joined back once
    def corpus() -> DataFrame:
        keep = select_canonical(pages, out["assignments"], idc, txt)
        return pages.join(
            keep.select(
                F.col("canonical_id").alias(idc), "cluster_id", "n_members"
            ),
            on=idc,
        )

    docs = ck.stage("corpus", corpus)

    # 3a. optional cross-corpus screen: drop kept pages that near-match
    # the frozen reference corpus (crawl N vs crawl N-1). Runs AFTER
    # canonical selection so only one representative per within-crawl
    # cluster is ever hashed against the reference side.
    if args.reference_corpus or args.emit_bands:
        from fuzzycat_spark.functions.normalize import (
            tokens_col,
            word_shingles_from_tokens,
        )
        from fuzzycat_spark.plans.checkpoint import materialize

        def _shingle_table(df: DataFrame) -> DataFrame:
            # tokens must be a materialized ATTRIBUTE before shingling:
            # HOF lambdas re-evaluate captured expressions per element
            # (see word_shingles_from_tokens) — the tokenize expression
            # inline would be O(L^2) regex work per document
            toks = materialize(
                df.select(F.col(idc).alias("id"), tokens_col(txt).alias("toks")),
                "cross_toks",
            )
            return toks.select(
                "id", word_shingles_from_tokens(F.col("toks")).alias("sh")
            )

    if args.reference_corpus:
        from fuzzycat_spark.operators.crossdedup import cross_corpus_pairs

        def cross_screened() -> DataFrame:
            ref_sh = _shingle_table(read_pages(spark, args.reference_corpus))
            rb = (
                spark.read.parquet(args.reference_bands)
                if args.reference_bands else None
            )
            matched = cross_corpus_pairs(
                _shingle_table(docs), ref_sh,
                jaccard_threshold=args.cross_jaccard, ref_bands=rb,
            ).select(F.col("new_id").alias(idc)).distinct()
            return docs.join(matched, on=idc, how="left_anti")

        docs = ck.stage("cross_screened", cross_screened)

    if args.strip_dup_spans > 0:
        from fuzzycat_spark.operators.spans import strip_dup_spans

        def span_stripped() -> DataFrame:
            return (
                strip_dup_spans(
                    docs, k=args.strip_dup_spans, id_col=idc, text_col=txt
                )
                .withColumnRenamed("n_removed", "dupspan_removed")
                .drop("n_tokens")
            )

        docs = ck.stage("span_stripped", span_stripped)

    # 4. optional decontamination / domain caps / mixing
    if args.eval_path:
        def decontaminated() -> DataFrame:
            verdict = decontaminate(
                docs, spark.read.parquet(args.eval_path),
                id_col=idc, text_col=txt, n=args.eval_ngram,
            )
            clean = verdict.filter(~F.col("contaminated")).select(idc)
            return docs.join(clean, on=idc, how="left_semi")

        docs = ck.stage("decontaminated", decontaminated)

    if args.eval_embeddings:
        from fuzzycat_spark.operators.decontaminate import (
            semantic_contamination,
            semantic_contamination_ann,
        )

        def semantic_clean() -> DataFrame:
            emb = spark.read.parquet(args.doc_embeddings)
            ev = spark.read.parquet(args.eval_embeddings)
            # judge only docs still alive AND embedded; unembedded docs
            # pass through (the screen can't see them — counted below)
            corpus_emb = emb.join(docs.select(idc), on=idc, how="left_semi")
            if args.semantic_ann:
                verdict = semantic_contamination_ann(
                    corpus_emb, ev, id_col=idc, vec_col=args.vec_col,
                    eval_id_col=args.eval_id_col,
                    threshold=args.semantic_threshold,
                    n_planes=args.semantic_planes, dim=args.embedding_dim,
                )
            else:
                verdict = semantic_contamination(
                    corpus_emb, ev, id_col=idc, vec_col=args.vec_col,
                    eval_id_col=args.eval_id_col,
                    threshold=args.semantic_threshold,
                )
            dirty = verdict.filter(F.col("contaminated")).select(idc)
            return docs.join(dirty, on=idc, how="left_anti")

        docs = ck.stage("semantic_clean", semantic_clean)

    if args.max_per_domain > 0:
        from fuzzycat_spark.functions.urls import surt_host

        def capped() -> DataFrame:
            with_dom = docs.withColumn("_domain", surt_host(F.col(idc)))
            kept = domain_cap(
                with_dom, "_domain", id_col=idc, text_col=txt,
                max_per_domain=args.max_per_domain,
            ).select(F.col("id").alias(idc))
            return with_dom.join(kept, on=idc, how="left_semi").drop("_domain")

        docs = ck.stage("capped", capped)

    if args.mix_budgets:
        budgets = {k: float(v) for k, v in json.loads(args.mix_budgets).items()}

        def mixed() -> DataFrame:
            weighted = docs.withColumn("_nchars", F.length(txt).cast("long"))
            return mix_corpus(
                weighted, budgets, weight_col="_nchars",
                id_col=idc, key_col="lang", seed=args.mix_seed,
            ).drop("_nchars")

        docs = ck.stage("mixed", mixed)

    if args.flatten_budget > 0:
        from fuzzycat_spark.operators.mixing import (
            sample_corpus,
            sqrt_temperature_rates,
        )

        def flattened() -> DataFrame:
            rates = sqrt_temperature_rates(
                docs, budget=args.flatten_budget, key_col="lang"
            )
            return sample_corpus(
                docs, rates, id_col=idc, key_col="lang", seed=args.mix_seed
            )

        docs = ck.stage("flattened", flattened)

    if args.token_budgets:
        tb = {k: int(v) for k, v in json.loads(args.token_budgets).items()}

        def token_budgeted() -> DataFrame:
            from fuzzycat_spark.functions.text import quality_score_cols
            from fuzzycat_spark.operators.mixing import token_budget_select

            cols = quality_score_cols(txt)
            scored = docs.withColumn("_w", cols["n_tokens"]).withColumn(
                "_s", F.floor(F.round(cols["quality"], 6) * 100).cast("long")
            )
            keep = (
                token_budget_select(
                    scored, tb, weight_col="_w", score_col="_s",
                    key_col="lang", id_col=idc, seed=args.mix_seed,
                )
                .filter(F.col("kept"))
                .select(F.col("id").alias(idc))
            )
            return docs.join(keep, on=idc, how="left_semi")

        docs = ck.stage("token_budgeted", token_budgeted)

    if args.vocab_top_k > 0:
        from fuzzycat_spark.operators.vocab import token_ngram_counts

        def vocab() -> DataFrame:
            return token_ngram_counts(docs, n=1, top_k=args.vocab_top_k,
                                      text_col=txt)

        ck.stage("vocab", vocab)  # side artifact; docs flow on unchanged

    if args.bpe_merges > 0:
        from fuzzycat_spark.operators.bpe import bpe_train, bpe_word_table

        def bpe_merge_table() -> DataFrame:
            w = bpe_word_table(docs, text_col=txt)
            merges, _ = bpe_train(w, args.bpe_merges, checkpointer=ck)
            return merges

        # side artifact: the learned subword merge table — the tokenizer
        # model bpe_apply folds over any future corpus. Each merge round
        # cuts lineage through the run checkpointer, so a killed run
        # resumes mid-merge-sequence like every other stage.
        ck.stage("bpe_merges", bpe_merge_table)

    if args.splits:
        from fuzzycat_spark.operators.mixing import assign_splits

        fracs = {k: float(v) for k, v in json.loads(args.splits).items()}

        def split_stamped() -> DataFrame:
            # docs already carry cluster_id from canonical selection, so
            # routing by it is pure projection — no join, no shuffle.
            # Hashing the CLUSTER label (not the doc id) is what keeps a
            # near-dup family on one side of every split boundary; see
            # operators/mixing.assign_splits_by_cluster for the general
            # (docs ⋈ assignments) form.
            return assign_splits(
                docs, fracs, id_col="cluster_id", seed=args.split_seed
            )

        docs = ck.stage("split_stamped", split_stamped)

        if args.screen_train_overlap > 0:
            from fuzzycat_spark.operators.decontaminate import (
                train_overlap_screen,
            )

            def train_screened() -> DataFrame:
                flagged = train_overlap_screen(
                    docs, id_col=idc, text_col=txt,
                    n=args.screen_train_overlap,
                ).filter(F.col("drop")).select(idc)
                return docs.join(flagged, on=idc, how="left_anti")

            # This stage REMOVES rows, so it must run before every side
            # artifact documented as covering the FINAL kept corpus
            # (postings / sketches / bands / bloom below) — otherwise a
            # screened-out train doc's id lands in the bloom filter and
            # its bands in the reference table, and the next crawl
            # silently drops fresh pages as duplicates of a doc that was
            # never shipped.
            docs = ck.stage("train_screened", train_screened)

    if args.emit_postings:
        from fuzzycat_spark.operators.retrieval import doc_term_rows

        def postings() -> DataFrame:
            return doc_term_rows(docs, id_col=idc, text_col=txt)

        # side artifact: the persisted posting table lexical_topk /
        # bm25_topk take via terms= (build once, query many times —
        # otherwise every retrieval call scans the corpus text twice)
        ck.stage("postings", postings)

    if args.emit_sketches:
        from fuzzycat_spark.operators.sketch import cms_counts, loglog_registers
        from fuzzycat_spark.operators.spans import raw_tokens

        def token_sketches() -> DataFrame:
            toks = docs.select(F.explode(raw_tokens(txt)).alias("tok"))
            regs = loglog_registers(
                toks.select(F.lit("all").alias("grp"), "tok"), ["grp"], "tok"
            ).select(
                F.lit("loglog").alias("sketch"), F.col("grp"),
                F.col("bucket").alias("r"), F.col("rho_max").cast("long").alias("v"),
            )
            cms = cms_counts(toks, "tok").select(
                F.lit("cms").alias("sketch"), F.lit("all").alias("grp"),
                (F.col("r") * 10_000 + F.col("bucket")).alias("r"),
                F.col("cnt").alias("v"),
            )
            return regs.unionByName(cms)

        # side artifact: O(1)-sized distinct-token + term-frequency
        # sketches of the FINAL kept corpus; sketches from successive
        # crawls merge by MAX (loglog) / SUM (cms) without reprocessing,
        # so corpus-growth audits never rescan history
        ck.stage("sketches", token_sketches)

    if args.emit_bands:
        from fuzzycat_spark.operators.lsh import minhash_band_table

        def band_table() -> DataFrame:
            return minhash_band_table(
                _shingle_table(docs), "id", "text",
                use_udf=True, shingles_col="sh",
            )

        # side artifact over the FINAL kept corpus (post screens/caps/
        # mixing — exactly what the next crawl is compared against): the
        # next run's --reference-bands, so the frozen side is hashed once
        ck.stage("bands", band_table)

    if args.emit_bloom:
        from fuzzycat_spark.operators.sketch import bloom_bits

        def bloom_table() -> DataFrame:
            return bloom_bits(
                docs.select(idc), idc,
                m_bits=args.bloom_m_bits, d=args.bloom_d,
            )

        # side artifact: membership filter over the kept ids — later
        # crawls screen with --seen-bloom (same m/d); filters from
        # successive crawls merge by OR (sketch.bloom_merge)
        ck.stage("bloom", bloom_table)

    # 5. training shards (optionally annotated with the packing layout —
    # pack_shard_sequences uses the same (id, seed) hash fields, so the
    # offsets land in exactly the shard/order write_training_shards emits)
    if args.pack_seq_len > 0:
        from fuzzycat_spark.operators.sharding import pack_shard_sequences

        def packed() -> DataFrame:
            layout = pack_shard_sequences(
                docs, seq_len=args.pack_seq_len, n_shards=args.n_shards,
                id_col=idc, text_col=txt, seed=args.shard_seed,
            ).select(idc, "n_tokens", "start_off", "start_seq", "end_seq")
            return docs.join(layout, on=idc)

        docs = ck.stage("packed", packed)

    write_training_shards(
        docs, args.output, args.n_shards, id_col=idc, seed=args.shard_seed
    )
    if args.export_jsonl:
        from fuzzycat_spark.operators.sharding import (
            export_jsonl_shards,
            jsonl_shard_manifest,
        )

        export_jsonl_shards(
            docs, args.export_jsonl, args.n_shards,
            id_col=idc, text_col=txt, seed=args.shard_seed,
        )
        jsonl_shard_manifest(
            docs, args.n_shards, id_col=idc, text_col=txt,
            seed=args.shard_seed,
        ).coalesce(1).write.mode("overwrite").parquet(
            args.export_jsonl.rstrip("/") + "/_manifest"
        )
    n_out = spark.read.parquet(args.output).count()
    print(json.dumps({
        "stages": list(ck._manifest),
        "docs_out": n_out,
        "n_shards": args.n_shards,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
