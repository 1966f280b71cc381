"""Text-analysis column builders for the LLM-data-pipeline surface.

All builders return pyspark Columns composed of built-in functions —
JVM-side, codegen-friendly, no Python in the hot path. They are shared
by the family-K queries (operators/llm.py) and usable standalone.

Grounding: the reference validates "consistency" by exact content
comparison (reference README.md:22, neurons/validator.py:138-141);
these builders generalize that to content fingerprinting, shingling
and quality scoring over a document corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A deliberately small, deterministic stopword list (shared with oracle
# SQL strings — keep in sync with STOPWORDS_SQL).
STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is")
STOPWORDS_SQL = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"

# BPE-ish tokenizer: word runs or single non-space punctuation.
TOKEN_REGEX = r"\w+|[^\w\s]"


def words(text: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus)."""
    return F.split(text, " ")


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(words(text)).cast("long")


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish regex token count (word pieces + punctuation)."""
    c = text if isinstance(text, Column) else F.col(text)
    # idx=0: full matches (Spark defaults to group 1, DuckDB to 0)
    return F.size(F.regexp_extract_all(c, F.lit(TOKEN_REGEX), 0)).cast("long")


def stopword_count(text: Column | str) -> Column:
    """How many tokens are stopwords (quality-signal numerator)."""
    return F.size(
        F.filter(words(text), lambda w: w.isin(*STOPWORDS))
    ).cast("long")


def quality_score(text: Column | str) -> Column:
    """Deterministic quality heuristic in [0,1]: rewards mid-length
    documents and a natural stopword ratio. Built-ins only.

    Deliberately NOT rounded: the identical double expression tree is
    evaluated on both engines, so the result is bit-exact, whereas
    ROUND itself diverges on exact-half rationals (Spark rounds the
    shortest decimal repr, DuckDB the full binary value)."""
    n = token_count_ws(text).cast("double")
    stop_ratio = stopword_count(text).cast("double") / n
    length_term = F.least(n / F.lit(200.0), F.lit(1.0))
    stop_term = F.lit(1.0) - F.abs(stop_ratio - F.lit(0.4))
    return F.lit(0.5) * length_term + F.lit(0.5) * stop_term


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 of the sorted
    distinct token set (near-dup-robust against token reordering)."""
    sorted_words = F.array_sort(F.array_distinct(words(text)))
    return F.md5(F.concat_ws(" ", sorted_words))


def shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as an array column, built JVM-side:
    transform(sequence(1, n-k+1), i -> words[i..i+k-1] joined).

    Documents with fewer than k words yield an EMPTY array — the
    guard matters: Spark's sequence(1, 0) counts DOWN ([1, 0]) and
    would drive element_at out of bounds (a crash under ANSI mode)."""
    w = words(text)
    shingle_at = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(w, i + j) for j in range(k)]
    )
    return F.when(
        F.size(w) >= k,
        F.transform(F.sequence(F.lit(1), F.size(w) - (k - 1)), shingle_at),
    ).otherwise(F.array().cast("array<string>"))


# Character-trigram profiles for the n-gram langid scorer. Small,
# hand-picked, deterministic; shared verbatim with the oracle SQL
# (keep LANG_TRIGRAM_PRIORITY order in sync with the CASE cascade).
LANG_TRIGRAMS: dict[str, tuple[str, ...]] = {
    "en": ("the", "he ", " th", "and", "ing", "ion"),
    "fr": ("le ", "la ", " de", "es ", "ent", "que"),
    "de": ("der", "und", "ich", "sch", "ein", "cht"),
    "es": ("el ", "los", " la", "ión", "ar ", "que"),
}
LANG_TRIGRAM_PRIORITY: tuple[str, ...] = ("en", "fr", "de", "es")


def char_trigrams(text: Column | str) -> Column:
    """Distinct character 3-grams of a string, built JVM-side
    (transform over a position sequence + substring). Texts shorter
    than 3 chars yield an EMPTY array — Spark's sequence(1, 0) counts
    DOWN and must be guarded, exactly like word shingles."""
    c = text if isinstance(text, Column) else F.col(text)
    return F.when(
        F.length(c) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(c) - 2),
                lambda i: F.substring(c, i, 3),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def trigram_scores(tg: Column) -> dict[str, Column]:
    """Per-language profile-overlap scores for a distinct-trigram
    array column (one array_intersect per language)."""
    return {
        lang: F.size(
            F.array_intersect(tg, F.array(*[F.lit(t) for t in profile]))
        )
        for lang, profile in LANG_TRIGRAMS.items()
    }


def langid_cascade(scores: dict[str, Column]) -> Column:
    """Argmax over language scores with the fixed priority cascade:
    each branch requires >= all later-priority scores and > 0,
    zero everywhere -> 'und' (mirrored verbatim in the oracle SQL).

    Callers should pass MATERIALIZED score columns (staged through a
    projection), not inline expressions: the cascade references each
    score several times, and HOF subtrees are excluded from Spark's
    subexpression elimination (LambdaVariable, SPARK-35410) — inlining
    re-evaluates the trigram transform ~20x per row."""
    expr = F.lit("und")
    for lang in reversed(LANG_TRIGRAM_PRIORITY):
        later = [
            scores[o]
            for o in LANG_TRIGRAM_PRIORITY[
                LANG_TRIGRAM_PRIORITY.index(lang) + 1 :
            ]
        ]
        cond = scores[lang] > 0
        for o in later:
            cond = cond & (scores[lang] >= o)
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def langid(text: Column | str) -> Column:
    """Marker-token language heuristic (n-gram-style rule cascade).
    A real model is out of scope; the operator shape — cascaded
    deterministic text predicates — is what a pipeline needs."""
    t = F.concat(F.lit(" "), text if isinstance(text, Column) else F.col(text), F.lit(" "))
    return (
        F.when(t.contains(" the ") | t.contains(" and "), "en")
        .when(t.contains(" le ") | t.contains(" la "), "fr")
        .when(t.contains(" der ") | t.contains(" und "), "de")
        .when(t.contains(" el ") | t.contains(" los "), "es")
        .otherwise("und")
    )


def portable_hash60(col: Column | str) -> Column:
    """Engine-portable 60-bit string hash: the first 15 hex digits of
    md5, parsed base-16 into a non-negative BIGINT. Spark's
    ``conv(substr(md5(s),1,15),16,10)`` and DuckDB's
    ``('0x'||substr(md5(s),1,15))::BIGINT`` are bit-identical, which
    is what lets the MinHash/SimHash dedup family carry full
    differential oracles (xxhash64/murmur3 have no DuckDB twin).
    60 bits < 63, so downstream modular arithmetic stays overflow-free
    in signed int64 on both engines."""
    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_portable_hash60(expr: str) -> str:
    """DuckDB twin of :func:`portable_hash60` (see its docstring)."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"
