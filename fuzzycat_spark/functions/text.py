"""Text analysis kernels: jaccard, token stats, quality, language-ID,
fingerprinting — all pure Catalyst column expressions (JVM-side, codegen),
each with a DuckDB-expressible oracle equivalent.

Reference semantics: jaccard `/root/reference/fuzzycat/utils.py:150-156`,
tokenize `utils.py:166-170`, token n-grams `utils.py:159-163`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from fuzzycat_spark.functions.normalize import slug_text, tokens_col

# Stopword inventories for the language-ID heuristic — the classifier's
# parameters (the Spark expression and the DuckDB oracle both derive from
# this constant, so they can never disagree). High-frequency function
# words per language, written in their POST-ASCII-FOLD form (the slug
# replaces every non-[a-z0-9] with a space, so diacritic words fragment —
# only diacritic-free forms are useful as features, which also means
# non-Latin-script languages are out of this classifier's scope by
# construction). Shared forms across languages (e.g. "la" fr/es, "in"
# en/de) are fine: the vote is argmax over per-language hit counts,
# ties -> "und". Accuracy on a natural-sentence eval fixture is asserted
# in tests/test_functions.py and reported in COVERAGE.md.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "in", "is", "that", "for", "with", "a",
        "as", "was", "on", "are", "by", "this", "be", "from", "at", "or",
        "an", "it", "not", "which", "but", "his", "her", "they", "have", "has",
        "had", "were", "will", "would", "there", "their", "we", "you", "all",
        "can", "if", "more", "so", "what", "when", "who", "out", "up",
        "about", "into", "than", "them", "then", "now", "only", "over",
        "also", "after", "most", "other", "some", "such", "our", "its",
        "two", "first", "new", "time", "may", "these", "years", "been",
        "could", "did", "do", "does", "because", "very", "just", "where",
        "how", "any", "each", "between", "both", "under", "while", "before",
        "during", "through", "without", "against", "never", "always",
    ),
    "de": (
        "der", "die", "das", "und", "ist", "nicht", "von", "mit", "ein", "zu",
        "den", "dem", "des", "eine", "einen", "auf", "im", "als", "auch", "sich",
        "nach", "bei", "aus", "wird", "werden", "sind", "oder", "wie", "dass", "fur",
        "einem", "einer", "war", "waren", "hat", "haben", "kann", "noch",
        "nur", "schon", "mehr", "wenn", "aber", "man", "es", "ich", "du",
        "wir", "ihr", "sie", "ihm", "ihn", "sein", "seine", "seiner",
        "unter", "gegen", "durch", "ohne", "um", "zum", "zur", "beim",
        "vom", "damit", "dabei", "wurde", "wurden", "zwischen", "immer",
        "alle", "allem", "jedoch", "doch", "sehr", "hier", "dort", "heute",
        "dann", "denn", "weil", "bis", "diese", "dieser", "dieses", "mich",
        "mir", "uns", "euch", "kein", "keine", "viel", "viele", "wieder",
    ),
    "fr": (
        "le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans",
        "des", "du", "en", "un", "au", "aux", "ce", "cette", "qui", "sur",
        "plus", "par", "avec", "sont", "ont", "mais", "ou", "nous", "se", "ne",
        "vous", "ils", "elle", "elles", "je", "tu", "il", "on", "son", "sa",
        "ses", "leur", "leurs", "notre", "votre", "nos", "vos", "comme",
        "tout", "tous", "toute", "toutes", "bien", "sans", "sous", "entre",
        "vers", "chez", "donc", "alors", "ainsi", "encore", "aussi",
        "quand", "si", "y", "lui", "cela", "cet", "fait", "faire", "peut",
        "avoir", "avait", "avaient", "sera", "fut", "celui", "celle",
        "ceux", "dont", "autre", "autres", "beaucoup", "peu", "moins",
        "toujours", "jamais", "ici", "maintenant", "pendant", "depuis",
    ),
    "es": (
        "el", "la", "los", "que", "y", "es", "en", "un", "por", "con",
        "las", "del", "se", "una", "su", "para", "no", "al", "lo", "como",
        "mas", "pero", "sus", "le", "ya", "o", "este", "ha", "son", "entre",
        "cuando", "muy", "sin", "sobre", "me", "hasta", "hay", "donde",
        "quien", "desde", "todo", "todos", "toda", "todas", "esta", "estas",
        "estos", "otros", "otro", "otra", "otras", "ella", "ellos", "ellas",
        "nosotros", "les", "ni", "contra", "ese", "esa", "esos", "esas",
        "mi", "mis", "tus", "nos", "fue", "era", "eran", "ser", "tiene",
        "tienen", "hace", "hacer", "puede", "pueden", "debe", "deben",
        "porque", "aunque", "durante", "antes", "ahora", "siempre", "nunca",
        "aqui", "alli", "mismo", "misma", "cada", "tanto", "tan", "bien",
    ),
    "it": (
        "il", "di", "che", "e", "la", "per", "un", "in", "non", "una",
        "sono", "con", "si", "del", "le", "della", "i", "al", "dei", "come",
        "anche", "piu", "nel", "ma", "ha", "gli", "alla", "lo", "questo", "essere",
        "era", "stato", "stata", "stati", "state", "questa", "questi",
        "queste", "quello", "quella", "quelli", "quelle", "ed", "dal",
        "dalla", "delle", "nelle", "nella", "loro", "suo", "sua", "suoi",
        "sue", "hanno", "fare", "molto", "molti", "molte", "quando",
        "prima", "dopo", "senza", "sotto", "sopra", "tra", "fra", "tutti",
        "tutto", "tutte", "anni", "anno", "parte", "dove", "perche", "se",
        "ci", "ne", "io", "tu", "lui", "lei", "noi", "voi", "mio", "mia",
        "sempre", "mai", "ancora", "ora", "qui", "cosa", "cose", "ogni",
    ),
    "pt": (
        "o", "de", "a", "e", "que", "do", "da", "em", "um", "para",
        "com", "nao", "uma", "os", "no", "se", "na", "por", "mais", "as",
        "dos", "como", "mas", "ao", "ele", "das", "seu", "sua", "ou", "foi",
        "pelo", "pela", "isso", "ela", "entre", "era", "depois", "sem",
        "mesmo", "mesma", "aos", "seus", "suas", "quem", "nas", "me",
        "esse", "essa", "esses", "essas", "eles", "elas", "voce", "num",
        "numa", "nem", "qual", "quais", "lhe", "deve", "devem", "pode",
        "podem", "ter", "tem", "tinha", "ser", "sendo", "sido", "muito",
        "muitos", "muitas", "quando", "onde", "porque", "ainda", "sempre",
        "nunca", "agora", "antes", "durante", "todo", "todos", "toda",
        "todas", "outro", "outra", "outros", "outras", "cada", "bem",
    ),
    "nl": (
        "de", "het", "een", "van", "en", "dat", "is", "in", "te", "zijn",
        "op", "voor", "met", "als", "aan", "er", "maar", "om", "dan",
        "zou", "zouden", "kunnen", "naar", "bij", "ook", "uit", "tot",
        "over", "dit", "deze", "die", "nog", "worden", "door", "onder",
        "tussen", "tegen", "zonder", "omdat", "toen", "nu", "al", "wel",
        "geen", "meer", "veel", "werd", "wordt", "heeft", "hebben", "kan",
        "moet", "moeten", "mijn", "hun", "onze", "jullie", "ik", "jij",
        "hij", "zij", "wij", "ze", "we", "niet", "was", "waren", "alle",
        "andere", "heel", "alleen", "altijd", "nooit", "hier", "daar",
    ),
    "sv": (
        "och", "att", "det", "som", "en", "den", "till", "med", "har",
        "de", "inte", "om", "ett", "men", "var", "sig", "vi", "kan",
        "man", "hade", "detta", "dessa", "alla", "andra", "mycket",
        "bara", "efter", "under", "skulle", "vara", "blev", "bli",
        "hans", "hennes", "deras", "vid", "genom", "mellan", "utan",
        "sedan", "redan", "igen", "alltid", "aldrig", "nu", "dag",
        "jag", "du", "han", "hon", "vad", "vem", "finns", "fanns",
        "mot", "eller", "ner", "upp", "ut", "in", "av", "ska", "sin",
        "sitt", "sina", "denna", "dock", "samt", "hur",
    ),
    "da": (
        "og", "i", "det", "at", "en", "den", "til", "er", "som", "de",
        "med", "han", "af", "for", "ikke", "der", "var", "mig", "sig",
        "men", "et", "har", "om", "vi", "min", "havde", "ham", "hun",
        "nu", "skal", "kan", "eller", "hvad", "jeg", "du", "hans",
        "hende", "hendes", "deres", "dette", "disse", "alle", "andre",
        "meget", "kun", "efter", "under", "uden", "mellem", "blev",
        "blive", "ved", "da", "hvor", "hvem", "hvordan", "ogsaa", "op",
        "ned", "ud", "ind", "over", "mod", "sin", "sit", "sine", "aldrig",
    ),
    "pl": (
        "i", "w", "nie", "na", "to", "jest", "sie", "z", "do", "ze",
        "tak", "jak", "po", "co", "ale", "o", "mnie", "juz", "tylko",
        "przez", "dla", "przy", "bez", "od", "pod", "nad", "ma", "byl",
        "byla", "bylo", "byly", "moze", "bardzo", "gdzie", "kiedy",
        "wszystko", "wszystkie", "jego", "jej", "ich", "nasz", "ten",
        "ta", "te", "tego", "tej", "tym", "tych", "ktory", "ktora",
        "ktore", "aby", "czy", "gdy", "oraz", "lub", "tez", "ja", "ty",
        "my", "wy", "oni", "one", "im", "nas", "was", "sa",
        "jestem", "jestes", "byc", "mam", "masz", "mamy", "macie",
    ),
    "ro": (
        "si", "de", "la", "in", "sa", "pe", "un", "o", "cu", "nu",
        "este", "care", "mai", "ce", "al", "lui", "din", "dar", "pentru",
        "ca", "sunt", "fost", "era", "erau", "acest", "aceasta", "unde",
        "cum", "atunci", "toate", "tot", "toti", "acestea", "acestor",
        "prin", "despre", "sub", "peste", "ei", "ele", "noi", "voi",
        "eu", "tu", "el", "ea", "meu", "mea", "tau", "ta", "sau", "se",
        "ne", "va", "le", "li", "fi", "fie", "avea", "are", "au", "am",
        "ati", "avem", "aceste", "acel", "acea", "foarte", "doar",
    ),
    "id": (
        "yang", "dan", "di", "dengan", "untuk", "dari", "pada", "ini",
        "itu", "adalah", "tidak", "ke", "dalam", "akan", "oleh", "juga",
        "karena", "ada", "mereka", "kita", "kami", "saya", "anda", "dia",
        "bisa", "sudah", "telah", "harus", "hanya", "lebih", "sangat",
        "atau", "jika", "tetapi", "namun", "seperti", "antara", "tanpa",
        "setelah", "sebelum", "ketika", "bahwa", "para", "dapat", "masih",
        "secara", "tersebut", "banyak", "semua", "setiap", "saat", "lalu",
        "kemudian", "sehingga", "yaitu", "bagi", "serta", "maka", "pun",
    ),
    "tr": (
        "ve", "bir", "bu", "da", "de", "ile", "daha", "en", "gibi",
        "ama", "ancak", "veya", "sonra", "kadar", "her", "ne", "o",
        "ben", "sen", "biz", "siz", "var", "yok", "olan", "olarak",
        "ise", "bunun", "bana", "sana", "bile", "hem", "hep", "sadece",
        "zaman", "burada", "orada", "nasil", "neden", "hangi", "kendi",
        "onun", "benim", "senin", "bizim", "sizin", "onlar", "onlara",
        "eger", "yani", "hatta", "belki", "tabii", "evet", "hayir",
    ),
}


def jaccard_col(a: Column, b: Column) -> Column:
    """Set jaccard |a∩b|/|a∪b| over two array columns; 0.0 when union empty."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count of the slugged text (BPE-ish proxy: the slug
    splits punctuation off first, so counts approximate subword-merge input)."""
    return F.size(tokens_col(col)).cast("long")


# GPT-2-style pre-tokenizer classes, minus the lookahead RE2 can't do:
# optional leading space + (letter run | digit run | punct run). Counting
# these matches approximates the sequence a BPE merge would start from.
# Shared verbatim by the DuckDB oracle (RE2) and Spark (Java regex).
BPE_ISH_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Pre-tokenizer match count over raw text — the LLM-pipeline token
    estimate (letters/digits/punctuation runs with attached space), native
    regexp_count, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("long")


def quality_score_cols(col: Column | str) -> dict[str, Column]:
    """Document-quality signals: length, token stats, alpha/digit/space
    ratios, stopword ratio — combined into a [0,1] score.

    All double arithmetic (IEEE-identical across engines); callers should
    round before hashing comparisons.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    toks = tokens_col(col)
    n_tok = F.size(toks).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(c, r"[^0-9]", "")).cast("double")
    space = F.length(F.regexp_replace(c, r"[^ ]", "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_STOPWORDS["en"]))
    ).cast("double")
    safe_n = F.greatest(n, F.lit(1.0))
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    alpha_ratio = alpha / safe_n
    digit_ratio = digit / safe_n
    space_ratio = space / safe_n
    stop_ratio = stop_hits / safe_tok
    mean_tok_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        (n - space) / safe_tok
    )
    # Heuristic blend: alphabetic, some stopwords, sane token length = good.
    score = (
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * F.least(stop_ratio * 2, F.lit(1.0))
        + F.lit(0.2) * F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0).otherwise(0.0)
        + F.lit(0.1) * (F.lit(1.0) - F.least(digit_ratio * 5, F.lit(1.0)))
    )
    return {
        "n_tokens": n_tok.cast("long"),
        "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio,
        "stop_ratio": stop_ratio,
        "mean_tok_len": mean_tok_len,
        "quality": score,
    }


def _lang_masks() -> tuple[list[str], dict[str, int]]:
    """Sorted language list + token → language-membership bitmask."""
    langs = sorted(LANG_STOPWORDS)
    mask: dict[str, int] = {}
    for i, lang in enumerate(langs):
        for w in LANG_STOPWORDS[lang]:
            mask[w] = mask.get(w, 0) | (1 << i)
    return langs, mask


def _argmax_lang(votes: list[tuple[str, Column]]) -> Column:
    """argmax over per-language vote columns; ties and zero hits → 'und'."""
    best = F.greatest(*[v for _, v in votes])
    n_best = sum(F.when(v == best, 1).otherwise(0) for _, v in votes)
    out = F.lit("und")
    # first language (alphabetical) achieving the max, only if unique and >0
    for lang, v in reversed(votes):
        out = F.when((best > 0) & (n_best == 1) & (v == best), lang).otherwise(out)
    return out


def lang_id_col(col: Column | str) -> Column:
    """Stopword-vote language ID over the slug tokens, as a pure Column
    expression (argmax over per-language stopword hits; ties and zero
    hits → 'und').

    The per-language `isin` scans cost n_langs × inventory-size string
    comparisons per token, which is fine for ad-hoc projections but
    measurably slow on the full 13 × ~100-word inventory — batch scans of
    a whole corpus should use `lang_id_table` (broadcast-join + one
    partial-aggregated shuffle), which computes identical votes.
    """
    toks = tokens_col(col)
    votes = [
        (lang, F.size(F.filter(toks, lambda t: t.isin(*stops))))
        for lang, stops in sorted(LANG_STOPWORDS.items())
    ]
    return _argmax_lang(votes)


def lang_id_table(
    df, id_col: str = "doc_id", text_col: str = "text",
    script_aware: bool = False,
):
    """(id_col, lang_pred) for a whole corpus — the batch/100 TB form of
    `lang_id_col`, vote-identical by construction.

    Plan: explode slug tokens → broadcast hash join against the ~1.2k-row
    stopword dictionary (token, per-language membership bitmask) → ONE
    shuffle of (id, 13 partial counts) with map-side combine → argmax.
    Per token this is one O(1) hash probe instead of n_langs ×
    inventory-size string comparisons; the shuffle carries one row per
    document regardless of corpus size. Docs with zero stopword tokens
    (or zero tokens) fall out of the join and coalesce to 'und'.

    `script_aware=True` is the batch form of `lang_id_script_col`:
    non-Latin-majority docs are labeled by their script's codegen rule
    (ja/ko/zh/el/he/th/hi + the cyrillic/arabic letter votes) and SKIP
    the token explode + dictionary join entirely — the ASCII slug
    destroys their tokens anyway, so the join work would be pure waste.
    Only latin/und docs pay the explode+join, and at web scale the
    non-Latin half of the corpus costs one regexp pass, no shuffle rows.
    """
    spark = df.sparkSession
    langs, mask = _lang_masks()
    dict_df = spark.createDataFrame(
        sorted(mask.items()), "tok string, mask long"
    )
    src = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
    if script_aware:
        src = src.withColumn("_script", script_of(F.col("_t")))
        latin = src.filter(F.col("_script").isin("latin", "und"))
    else:
        latin = src
    toks = latin.select("_id", F.explode(tokens_col("_t")).alias("tok"))
    hits = toks.join(F.broadcast(dict_df), on="tok")
    agg = hits.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.col("mask").bitwiseAND(F.lit(1 << i)) != 0, 1).otherwise(0)
            ).alias(f"_v{i}")
            for i in range(len(langs))
        ]
    )
    votes = [(lang, F.col(f"_v{i}")) for i, lang in enumerate(langs)]
    pred = agg.select("_id", _argmax_lang(votes).alias("lang_pred"))
    joined = src.join(pred, on="_id", how="left")
    stop_vote = F.coalesce(F.col("lang_pred"), F.lit("und"))
    if script_aware:
        label = F.when(
            F.col("_script").isin("latin", "und"), stop_vote
        ).otherwise(_nonlatin_lang_col(F.col("_script"), F.col("_t")))
    else:
        label = stop_vote
    return joined.select(F.col("_id").alias(id_col), label.alias("lang_pred"))


# ---------------------------------------------------------------------------
# script detection (codepoint-range majority vote, pure Catalyst)
# ---------------------------------------------------------------------------

# (script, regex char class) in PRECEDENCE order for ties — a doc mixing
# kana with han is Japanese-shaped, so kana outranks han; everything
# outranks latin because web chrome/URLs leak ascii into every page.
SCRIPT_CLASSES: tuple[tuple[str, str], ...] = (
    ("kana", r"[぀-ゟ゠-ヿ]"),
    ("hangul", r"[가-힯ᄀ-ᇿ]"),
    ("han", r"[㐀-䶿一-鿿]"),
    ("cyrillic", r"[Ѐ-ӿԀ-ԯ]"),
    ("greek", r"[Ͱ-Ͽἀ-῿]"),
    ("arabic", r"[؀-ۿݐ-ݿ]"),
    ("hebrew", r"[֐-׿]"),
    ("devanagari", r"[ऀ-ॿ]"),
    ("thai", r"[฀-๿]"),
    ("latin", r"[A-Za-zÀ-ɏ]"),
)

NON_LATIN_SCRIPTS: tuple[str, ...] = tuple(
    s for s, _ in SCRIPT_CLASSES if s != "latin"
)


def script_counts(col: Column | str) -> dict[str, Column]:
    """Per-script codepoint counts — one native regexp_count per class,
    all inside whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(cls)) for name, cls in SCRIPT_CLASSES}


def script_of(col: Column | str) -> Column:
    """Majority script of a text column ('und' when no class matches) —
    the router for slug_mode='auto' corpora: non-Latin scripts need the
    NFKD slugifier + CJK bigram tokenization, and a cheap plan-time
    label beats per-operator configuration. Ties resolve by
    SCRIPT_CLASSES precedence (kana > han: mixed kana/han is
    Japanese-shaped; latin last: ascii chrome leaks into every page).
    Pure Catalyst — a when-chain over regexp_count, mirroring the
    lang-ID argmax, and DuckDB-expressible for the oracle."""
    counts = script_counts(col)
    best = F.greatest(*counts.values())
    pick = None
    for name, _ in SCRIPT_CLASSES:
        cond = counts[name] == best
        pick = F.when(cond, name) if pick is None else pick.when(cond, name)
    return F.when(best > 0, pick).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# script-conditional language ID (pure Catalyst, DuckDB-mirrorable)
# ---------------------------------------------------------------------------

# Scripts that pin the language outright on the web's language mix: kana
# appears only in Japanese (and outranks han in script_of, so ja text
# with kanji still routes here); hangul is Korean; a han-majority doc
# WITHOUT kana is Chinese-shaped; Greek/Hebrew/Thai/Devanagari each carry
# one dominant web language (devanagari → hi over mr/ne is the majority
# call, same spirit as the stopword vote's argmax).
SCRIPT_SINGLE_LANG: tuple[tuple[str, str], ...] = (
    ("kana", "ja"),
    ("hangul", "ko"),
    ("han", "zh"),
    ("greek", "el"),
    ("hebrew", "he"),
    ("thai", "th"),
    ("devanagari", "hi"),
)

# Cyrillic splits by DISTINCTIVE LETTER inventories (the stopword trick
# doesn't transfer: the ASCII slug destroys Cyrillic tokens, and the
# orthographies differ more by alphabet than by function words):
# ы/э/ё exist in Russian but not Ukrainian/Serbian (and ы/э not in
# Bulgarian); і/ї/є/ґ are Ukrainian-only; ъ is ~2-3% of Bulgarian
# letters but rare in Russian (hard-sign spellings only); ј/љ/њ/ђ/ћ/џ
# are Serbian-only. Vote = argmax of the four counts, ties/zero → 'und'.
CYRILLIC_LANG_CHARS: tuple[tuple[str, str], ...] = (
    ("bg", "[ъЪ]"),
    ("ru", "[ыэёЫЭЁ]"),
    ("sr", "[јљњђћџЈЉЊЂЋЏ]"),
    ("uk", "[іїєґІЇЄҐ]"),
)

# Arabic script: Urdu's retroflex/aspiration letters (ٹ ڈ ڑ ں ے ہ ھ) do
# not occur in Arabic or Persian; Persian's پ چ ژ گ do not occur in
# Arabic but DO occur in Urdu — so the dispatch is a precedence chain
# (ur before fa), defaulting to 'ar' when neither inventory fires.
ARABIC_LANG_CHAIN: tuple[tuple[str, str], ...] = (
    ("ur", "[ٹڈڑںےہھ]"),
    ("fa", "[پچژگ]"),
)


def _cyrillic_lang_col(c: Column) -> Column:
    votes = [
        (lang, F.regexp_count(c, F.lit(cls)))
        for lang, cls in CYRILLIC_LANG_CHARS
    ]
    return _argmax_lang(votes)


def _arabic_lang_col(c: Column) -> Column:
    out: Column = F.lit("ar")
    for lang, cls in reversed(ARABIC_LANG_CHAIN):
        out = F.when(F.regexp_count(c, F.lit(cls)) > 0, F.lit(lang)).otherwise(out)
    return out


def _nonlatin_lang_col(script: Column, c: Column) -> Column:
    """Label for a doc whose majority script is NON-Latin (see
    lang_id_script_col); scripts with no rule fall to 'und'."""
    out: Column = F.lit("und")
    for s_name, lang in SCRIPT_SINGLE_LANG:
        out = F.when(script == s_name, F.lit(lang)).otherwise(out)
    out = F.when(script == "cyrillic", _cyrillic_lang_col(c)).otherwise(out)
    out = F.when(script == "arabic", _arabic_lang_col(c)).otherwise(out)
    return out


def lang_id_script_col(col: Column | str) -> Column:
    """Script-conditional language ID: `script_of` routes each document
    to the detector that can actually see its language —

    - latin / und  → the stopword vote (`lang_id_col`, 13 languages)
    - kana/hangul/han/greek/hebrew/thai/devanagari → the script's
      dominant language (ja/ko/zh/el/he/th/hi)
    - cyrillic     → distinctive-letter argmax (ru/uk/bg/sr)
    - arabic       → distinctive-letter precedence chain (ur/fa/ar)

    Everything is native regexp_count + when-chains (whole-stage codegen,
    no Python), and every branch has an exact DuckDB mirror for the
    driver gate. This closes the round-4 gap where non-Latin text always
    answered 'und' (reference scope: sandcrawler.py exists precisely
    because of non-Latin titles)."""
    c = F.col(col) if isinstance(col, str) else col
    script = script_of(c)
    return F.when(script.isin("latin", "und"), lang_id_col(c)).otherwise(
        _nonlatin_lang_col(script, c)
    )


def doc_fingerprint(col: Column | str, n: int = 3) -> Column:
    """Deterministic document fingerprint: min md5 over word n-gram shingles
    (a 1-permutation MinHash — robust to local edits, cheap to compare).
    Empty docs → md5 of empty string.
    """
    from fuzzycat_spark.functions.normalize import word_shingles

    sh = word_shingles(col, n)
    return F.when(F.size(sh) == 0, F.md5(F.lit("").cast("binary"))).otherwise(
        F.array_min(F.transform(sh, lambda s: F.md5(s.cast("binary"))))
    )


__all__ = [
    "LANG_STOPWORDS",
    "jaccard_col",
    "token_count",
    "quality_score_cols",
    "lang_id_col",
    "lang_id_table",
    "lang_id_script_col",
    "SCRIPT_SINGLE_LANG",
    "CYRILLIC_LANG_CHARS",
    "ARABIC_LANG_CHAIN",
    "doc_fingerprint",
    "slug_text",
]
