"""Text-analysis operators (extension surface: training-data pipelines).

Everything is built from JVM-side ``pyspark.sql.functions`` (split, HOFs,
regexp) — no Python UDFs in any hot path, so plans stay inside whole-stage
codegen and scale linearly with partitions.

Cross-engine contract: the tokenizer (``lower`` + ``split`` on ``\\W+``) was
verified to produce identical arrays to DuckDB's ``string_split_regex``,
including empty-token edge cases; shingling and all ratio arithmetic mirror
the oracle SQL in queries/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"\W+"

#: Per-language function-word markers for the language-ID heuristic.
#: Order matters: ties resolve to the first language in this list.
LANG_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("de", ("der", "die", "das", "und", "ist")),
    ("en", ("the", "a", "is", "and", "of")),
    ("es", ("el", "los", "las", "es", "y")),
    ("fr", ("le", "les", "est", "et", "une")),
    ("zh", ("de5", "shi4", "le5", "he2", "zai4")),
]

STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "is")


def tokens(col: Column) -> Column:
    """Lowercased \\W+ tokenization; keeps boundary empties (both engines)."""
    return F.split(F.lower(col), TOKEN_PATTERN)


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles, built by zipping the token array with
    its own shifted slices.

    Deliberately avoids ``transform(sequence(...), i -> element_at(toks, i))``:
    when ``toks`` is an inline expression (split of the raw text), Catalyst's
    project-collapsing substitutes that expression into the lambda body, so
    ``element_at`` re-tokenizes the document once per shingle element —
    measured 100x slowdown at sf0.1. ``zip_with`` evaluates each argument
    array exactly once per row, so the cost stays O(tokens) however the
    optimizer inlines it. The trailing n-1 zip entries are padded with nulls
    (``concat_ws`` skips them), producing truncated grams — sliced off.

    Guarded so <n-token docs yield an empty array."""
    gram = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.size(toks))
        gram = F.zip_with(gram, shifted, lambda a, b: F.concat_ws(" ", a, b))
    gram = F.slice(gram, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(F.size(toks) >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def all_ngrams(toks: Column, n: int = 2) -> Column:
    """Word n-grams WITH duplicates kept — the repetition-analysis variant
    of ``shingles`` (Gopher-style duplicate-n-gram-fraction rules need the
    multiplicity, not the set). Same zip_with construction (each argument
    array evaluated exactly once per row; see ``shingles`` for why not
    transform(sequence)), minus the final array_distinct."""
    gram = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.size(toks))
        gram = F.zip_with(gram, shifted, lambda a, b: F.concat_ws(" ", a, b))
    gram = F.slice(gram, 1, F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.when(F.size(toks) >= n, gram).otherwise(
        F.array().cast("array<string>")
    )


#: BPE-ish pre-tokenizer pattern (GPT-2-style coarse classes): letter runs,
#: digit runs, punctuation runs. Verified to produce identical token lists
#: in Spark (java.util.regex) and DuckDB (RE2) — both engines use leftmost
#: longest-alternative-first matching for this alternation.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_ish_tokens(col: Column) -> Column:
    """Lowercased BPE-ish pre-tokenization (the token-count proxy an LLM
    data pipeline budgets with before running the real tokenizer)."""
    return F.regexp_extract_all(F.lower(col), F.lit(BPE_ISH_PATTERN), 0)


def token_count(toks: Column) -> Column:
    return F.size(toks).cast("long")


def distinct_token_count(toks: Column) -> Column:
    return F.size(F.array_distinct(toks)).cast("long")


def stopword_count(toks: Column) -> Column:
    """Number of token occurrences that are stopwords (JVM array filter)."""
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")


def type_token_ratio(toks: Column) -> Column:
    return distinct_token_count(toks).cast("double") / F.nullif(
        token_count(toks).cast("double"), F.lit(0.0)
    )


def mean_token_length(col: Column, toks: Column) -> Column:
    """Mean token length = non-space chars / tokens (cheap, no re-explode)."""
    chars = F.length(F.regexp_replace(F.lower(col), r"\W+", ""))
    return chars.cast("double") / F.nullif(token_count(toks).cast("double"), F.lit(0.0))


def quality_score(toks: Column) -> Column:
    """Composite [0,1] quality heuristic: lexical diversity + length +
    stopword-density terms. Deterministic arithmetic, mirrored in SQL."""
    ttr = type_token_ratio(toks)
    length_term = F.least(F.lit(1.0), token_count(toks).cast("double") / F.lit(100.0))
    stop_ratio = stopword_count(toks).cast("double") / F.nullif(
        token_count(toks).cast("double"), F.lit(0.0)
    )
    return (
        F.lit(0.3) * ttr
        + F.lit(0.4) * length_term
        + F.lit(0.3) * (F.lit(1.0) - stop_ratio)
    )


def lang_scores(toks: Column) -> list[tuple[str, Column]]:
    """Marker-hit count per language (see LANG_MARKERS)."""
    return [
        (lang, F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long"))
        for lang, markers in LANG_MARKERS
    ]


def predicted_lang(toks: Column) -> Column:
    """Argmax over lang_scores with ties resolved by LANG_MARKERS order."""
    scores = lang_scores(toks)
    best = F.greatest(*[s for _, s in scores])
    expr = F.when(scores[0][1] == best, F.lit(scores[0][0]))
    for lang, s in scores[1:]:
        expr = expr.when(s == best, F.lit(lang))
    return expr
