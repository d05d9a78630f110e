"""Generate fixtures/webfilter_docs.parquet — one planted document per
Gopher rule and per C4 arm (`functions/webfilters.py`, gates
`gopher_rules` / `c4_clean`), plus one page that passes everything.

Run: python tools/make_webfilter_fixture.py
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "webfilter_docs.parquet"
)

# 60 words of plain prose, 4 lines, terminal punctuation, stopwords —
# passes every Gopher rule and survives C4 cleaning intact
GOOD = "\n".join(
    [
        "The crawler fetched the page and stored the bytes with care.",
        "We then parsed the markup to recover the text of the article.",
        "Each line of that text ends with clear terminal punctuation marks.",
        "Filters have to keep prose like this and drop the junk pages.",
        "That is the whole point of the quality suite we ship here today.",
    ]
)

DOCS: list[tuple[str, str]] = [
    ("good", GOOD),
    # fails ok_word_count (12 words)
    ("too_short", "The page has only a dozen words of text to offer here."),
    # fails ok_mean_word_len (> 10): long identifiers, padded to 50+ words
    (
        "long_words",
        " ".join(["supercalifragilistic" + str(i) for i in range(55)]),
    ),
    # fails ok_symbol_ratio: hashtag spam over 50+ words
    (
        "hashtag_spam",
        " ".join(f"#tag{i} word{i} the of and" for i in range(14)),
    ),
    # fails ok_bullet: 10 of 10 lines bulleted (50+ words total)
    (
        "bullet_list",
        "\n".join(f"- item {i} with the usual five words here" for i in range(10)),
    ),
    # fails ok_ellipsis: every other line is a teaser ending in ...
    (
        "teasers",
        "\n".join(
            (
                f"Read the full story number {i} right now..."
                if i % 2 == 0
                else f"The article {i} text continues with more words."
            )
            for i in range(10)
        ),
    ),
    # fails ok_alpha_words: mostly numbers (60 words, 75% numeric)
    (
        "number_table",
        " ".join(
            ("the" if i % 4 == 0 else str(1000 + i)) for i in range(60)
        ),
    ),
    # fails ok_stop_words: word soup with zero required stopwords
    ("no_stopwords", " ".join(f"zork{i} blarg{i} quux{i}" for i in range(20))),
    # C4: javascript + short + unterminated lines cleaned away, page kept
    (
        "c4_cleanable",
        "\n".join(
            [
                "Please enable JavaScript to view the comments section.",
                "Menu",
                "This first real sentence carries more than five words.",
                "this line has plenty of words but no terminal mark",
                "A second real sentence also carries well over five words.",
                "The third sentence closes the page with enough words too.",
            ]
        ),
    ),
    # C4: lorem ipsum page dropped whole
    (
        "c4_lorem",
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit sed do.\n"
        "The rest of the template page never got filled in properly.\n"
        "Nobody should train on placeholder text like this page here.",
    ),
    # C4: curly brace (leaked code/templating) page dropped whole
    (
        "c4_brace",
        "The page body leaked a template fragment into the text.\n"
        "if (user.loggedIn) { render(profile); } else { redirect(); }\n"
        "The surrounding prose would otherwise have been acceptable.",
    ),
    # C4: survives cleaning but only 2 sentences -> dropped
    (
        "c4_two_sentences",
        "The first sentence of the stub page is right here.\n"
        "The second and final sentence follows it immediately after.",
    ),
    # empty text: every counter must be 0/false, nothing NULL
    ("empty", ""),
]


def main() -> None:
    table = pa.table(
        {
            "doc_id": pa.array([d for d, _ in DOCS], pa.string()),
            "text": pa.array([t for _, t in DOCS], pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {len(DOCS)} docs -> {OUT}")


if __name__ == "__main__":
    main()
