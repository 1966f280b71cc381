"""Long-document differential: the HOF scale corpus (VERDICT r10 #3).

The r10/r12 HOF audits proved that an expression captured inside a
Spark higher-order-function lambda re-evaluates PER ELEMENT — the
shingle/trigram/int8 quadratics all hid at fixture scale (~200-word
docs) and only detonated on long documents (a 60k-word web document
pushed dedup_near_minhash past 10 MINUTES pre-fix). 100 TB corpora
carry such documents routinely, so this module runs EVERY
document-reading HOF-based key differentially over a corpus whose
documents are 10k+ words / 100k+ chars:

* correctness: Spark must still hash-match the DuckDB oracle at this
  document length (the oracles are linear-by-construction SQL, so a
  value divergence here is an engine bug, not an oracle artifact);
* scale: the whole parametrized sweep completes in suite time at all
  — a reintroduced per-document quadratic turns one of these keys
  into a multi-minute hang (the r10 pre-fix measurements), which the
  per-key ratio pin at the bottom catches explicitly.

Key selection is COMPUTED from the fingerprint closure (any key whose
transitive engine source both uses a HOF and reads the documents
table), so a new HOF-based operator joins this sweep automatically.
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_subnet_spark.operators import ORACLES, QUERIES
from scripts.fingerprints import _closure_sources
from tests.conftest import assert_frames_match
from tests.test_micro_differential import _micro_tables

_HOF_TOKENS = ("F.transform(", "F.aggregate(", "F.filter(", "F.zip_with(")


def _hof_document_keys() -> list[str]:
    keys = []
    for k in sorted(QUERIES):
        srcs: list[str] = []
        _closure_sources(QUERIES[k], set(), srcs)
        joined = "\n".join(srcs)
        if any(t in joined for t in _HOF_TOKENS) and (
            '"documents"' in joined or "'documents'" in joined
        ):
            keys.append(k)
    return keys


LONGDOC_KEYS = _hof_document_keys()


def _long_text(n_words: int, seed: int) -> str:
    """Deterministic pseudo-natural text: a ~600-word vocabulary with
    Zipf-ish reuse plus stopwords, so shingles are mostly distinct
    (DF-cap realistic) while unigram stats stay non-degenerate."""
    rng = np.random.RandomState(seed)
    stop = ["the", "a", "of", "and", "to", "in", "is"]
    vocab = [f"w{i}" for i in range(600)]
    out = []
    for i in range(n_words):
        if i % 4 == 3:
            out.append(stop[int(rng.randint(0, len(stop)))])
        else:
            # Zipf-ish: favor low vocabulary ids
            out.append(vocab[int(rng.zipf(1.3)) % len(vocab)])
    return " ".join(out)


def _longdoc_tables():
    tables = _micro_tables()
    docs = tables["documents"].copy()
    base = _long_text(12_000, seed=3)
    texts = {
        # a 12k-word document (pre-fix shingling paid ~50 s at 16k)
        12: base,
        # its near-duplicate: same text with a changed tail, so the
        # dedup keys must process BOTH long docs AND pair them
        13: base[: len(base) - 40] + " changed tail of this document",
        # a 120k-char low-space document: the char-trigram / byte-walk
        # path (pre-fix: 160k chars = 60.8 s)
        14: "abcdefgh" * 15_000,
    }
    rows = []
    for doc_id, text in texts.items():
        rows.append(
            {
                "doc_id": np.int64(doc_id),
                "text": text,
                "lang": ["en", "de", "fr"][doc_id % 3],
                "source": f"src{doc_id % 4}",
                "n_chars": len(text),
            }
        )
    import pandas as pd

    tables["documents"] = pd.concat(
        [docs, pd.DataFrame(rows)], ignore_index=True
    )
    return tables


@pytest.fixture(scope="module")
def longdoc_dir(tmp_path_factory) -> str:
    dst = tmp_path_factory.mktemp("longdoc_fixture")
    for name, df in _longdoc_tables().items():
        df.to_parquet(dst / f"{name}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def lddb(longdoc_dir):
    import duckdb

    con = duckdb.connect()
    for name in _longdoc_tables():
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{longdoc_dir}/{name}.parquet'"
        )
    yield con
    con.close()


def test_longdoc_key_selection_is_nonempty():
    """The computed sweep must cover the known shingle consumers —
    an empty or shrunken selection means the closure walk broke, not
    that the engine lost its HOF keys."""
    assert len(LONGDOC_KEYS) >= 15, LONGDOC_KEYS
    for must in (
        "dedup_near_minhash",
        "dedup_ngram_jaccard",
        "dedup_simhash",
        "text_quality_gopher",
    ):
        assert must in LONGDOC_KEYS


@pytest.mark.parametrize("key", LONGDOC_KEYS)
def test_longdoc_differential(spark, longdoc_dir, lddb, key):
    got = QUERIES[key](spark, longdoc_dir).toPandas()
    want = lddb.sql(ORACLES[key]).df()
    assert_frames_match(got, want, f"longdoc:{key}")


def test_longdoc_worst_key_scales_linearly(spark, tmp_path):
    """Explicit ratio pin through the FULL worst-case key (not just
    the column builder): dedup_near_minhash over a 2-doc corpus at
    6k words vs 24k words — 4x the words is ~4x the work when linear
    (shingle -> minhash -> band join), ~16x when a captured
    expression re-quadratices. Pre-fix this measured minutes at the
    larger size; the ratio is load-proof (both runs share the box)."""
    import time

    import pandas as pd

    def _corpus(n_words: int) -> str:
        base = _long_text(n_words, seed=11)
        docs = pd.DataFrame(
            {
                "doc_id": np.arange(2, dtype=np.int64),
                "text": [base, base + " tail"],
                "lang": ["en", "en"],
                "source": ["src0", "src1"],
                "n_chars": [len(base), len(base) + 5],
            }
        )
        d = tmp_path / f"ld_{n_words}"
        d.mkdir()
        docs.to_parquet(d / "documents.parquet")
        return str(d)

    def _timed(sf_dir: str) -> float:
        t0 = time.time()
        QUERIES["dedup_near_minhash"](spark, sf_dir).collect()
        return time.time() - t0

    t_small = _timed(_corpus(6_000))
    t_big = _timed(_corpus(24_000))
    assert t_big < 10 or t_big < 10 * max(t_small, 0.5), (
        f"dedup_near_minhash 24k words took {t_big:.1f}s vs "
        f"{t_small:.1f}s at 6k — super-linear, HOF quadratic again?"
    )
