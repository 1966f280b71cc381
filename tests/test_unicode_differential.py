"""Unicode differential: the text/dedup/sampling families on a corpus
full of non-ASCII hazards.

Every fixture and every other differential corpus is ASCII by
construction — an explicit precondition, but only the MULTIMODAL
char-wise regenerating oracles actually need it (byte == char). A real
100 TB corpus is not ASCII, so the text-processing surface itself must
be unicode-clean: shingling, fingerprints, token counts, BPE, LM
scoring, language ID, quality filters, dedup and sampling must all
agree with the DuckDB oracle when documents carry precomposed vs
combining accents, CJK, emoji with ZWJ joiners, RTL script,
astral-plane codepoints (surrogate pairs in UTF-16 land) and NBSP
whitespace. This module extends the adversarial micro corpus with ten
such documents and re-runs the whole family differentially — same
comparator as the driver gate.

Excluded: the multimodal keys (ASCII is their documented oracle
precondition) and families that never touch document text.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from map_reduce_subnet_spark.operators import ORACLES, QUERIES
from tests.conftest import assert_frames_match
from tests.test_micro_differential import _micro_tables

UNI_TEXTS = [
    "café déjà vu naïve façade",      # precomposed accents
    "café déjà vu",                          # combining marks
    "日本語の文書 中文文档",  # CJK
    "emoji \U0001f600 stream \U0001f469‍\U0001f4bb done", # emoji + ZWJ
    "مرحبا بالعالم",  # RTL Arabic
    "mixed ASCII and ümläuts plus € prices",
    "astral \U00010348 gothic \U0001d11e clef",                # surrogate pairs
    "nbsp separated tokens here",                    # NBSP
    "plain ascii control sample text for contrast",
    "ZALGO źáĺǵó text",
]

UNICODE_KEYS = sorted(
    k
    for k in QUERIES
    if (
        k.startswith(("text_", "dedup_", "sample_", "quality_"))
        or k in ("split_leakage_safe", "pipeline_curation_e2e",
                 "pipeline_sequence_pack", "str_hash")
    )
)


@pytest.fixture(scope="module")
def unicode_dir(tmp_path_factory) -> str:
    tables = _micro_tables()
    docs = tables["documents"]
    base = int(docs["doc_id"].max()) + 1
    uni = pd.DataFrame(
        {
            "doc_id": np.arange(base, base + len(UNI_TEXTS), dtype=np.int64),
            "text": UNI_TEXTS,
            "lang": [
                ["en", "ja", "ar", "de", "fr"][i % 5]
                for i in range(len(UNI_TEXTS))
            ],
            "source": [f"src{i % 4}" for i in range(len(UNI_TEXTS))],
            "n_chars": [len(t) for t in UNI_TEXTS],
        }
    )
    tables["documents"] = pd.concat([docs, uni], ignore_index=True)
    dst = tmp_path_factory.mktemp("unicode_fixture")
    for name, df in tables.items():
        df.to_parquet(dst / f"{name}.parquet")
    return str(dst)


@pytest.fixture(scope="module")
def uddb(unicode_dir):
    import duckdb

    con = duckdb.connect()
    for name in _micro_tables():
        con.sql(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM '{unicode_dir}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("key", UNICODE_KEYS)
def test_unicode_corpus_differential(spark, unicode_dir, uddb, key):
    got = QUERIES[key](spark, unicode_dir).toPandas()
    want = uddb.sql(ORACLES[key]).df()
    assert_frames_match(got, want, f"unicode:{key}")
