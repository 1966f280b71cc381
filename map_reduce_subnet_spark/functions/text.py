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
    would drive element_at out of bounds (a crash under ANSI mode).

    LET-BINDING, load-bearing (r10): the split array is bound ONCE as
    a lambda variable via transform over a one-element array, because
    an expression referenced from INSIDE a HOF lambda is re-evaluated
    per element — the original form re-split the whole text for every
    element_at, making shingling O(words²) per document (measured:
    16k words = 49.8 s vs 0.15 s let-bound, identical output). Long
    web documents are routine at 100 TB, so the quadratic form is a
    scale-killer; tests/test_properties.py pins the linear scaling."""

    def _shingles_of(wa: Column) -> Column:
        def sh(i: Column) -> Column:
            return F.concat_ws(
                " ", *[F.element_at(wa, i + j) for j in range(k)]
            )

        return F.when(
            F.size(wa) >= k,
            F.transform(F.sequence(F.lit(1), F.size(wa) - (k - 1)), sh),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(words(text)), _shingles_of))


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
    """Distinct character 3-grams of a string, built JVM-side. Texts
    shorter than 3 chars yield an EMPTY array — Spark's
    sequence(1, 0) counts DOWN and must be guarded, exactly like word
    shingles.

    LET-BINDING, load-bearing (r10, the shingles() lesson applied to
    characters): the original form called substring(text, i, 3) per
    position from inside the lambda — each call walks the UTF-8 bytes
    to position i, so the trigram pass was O(chars²) per document
    (measured: 160k chars = 60.8 s vs linear after the fix). The text
    is split to a codepoint array ONCE (Spark's split('') is
    codepoint-correct, astral planes included — verified against
    substring on the unicode corpus) and bound as a lambda variable;
    element_at on the array is O(1).

    VERSION DEPENDENCY (ADVICE r10): the split('')-yields-codepoints
    behavior relied on here is Spark >= 3.4 semantics (SPARK-40194
    changed split with an empty regex to drop the trailing empty
    string; earlier lines also differed on surrogate-pair handling).
    This repo targets PySpark 4.x where it is stable; a backport to
    Spark < 3.4 must re-verify char_trigrams against substring on the
    unicode corpus (tests/test_edge_inputs.py) before trusting it."""
    c = text if isinstance(text, Column) else F.col(text)

    def _trigrams_of(ch: Column) -> Column:
        return F.when(
            F.size(ch) >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(ch) - 2),
                    lambda i: F.concat(
                        F.element_at(ch, i),
                        F.element_at(ch, i + 1),
                        F.element_at(ch, i + 2),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.flatten(F.transform(F.array(F.split(c, "")), _trigrams_of))


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
