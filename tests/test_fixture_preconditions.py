"""Loud guards for the fixture properties the oracles ASSUME.

NOTES invariant #9: the streaming-true oracles are only valid because
the static events fixture has (a) unique event_ids (dedup identity)
and (b) no boundary-exact windows (the closed-window rule's <=/<
convention cannot flip a row). The differential corpora preserve these
by construction; the driver's testdata preserves them by accident. If
the driver ever REGENERATES testdata without them, every downstream
failure would surface as an inscrutable hash mismatch in some
streaming key — this module fails first, with the actual violated
precondition in the assertion message.

Checked per SF dir (all three):
* events.event_id unique — dropDuplicates(event_id) is the identity.
* no event ts on the 1-minute grid — every tumbling width (2 m, 1 h),
  slide (5 m), and watermark delay (10 m, 30 m) in streaming/jobs.py
  is a multiple of 60 s, so minute-grid avoidance keeps every window
  boundary and every closed-window comparison strict.
* no two consecutive same-user events exactly 30 m apart — the
  session-window merge decision (gap <=/<) stays strict.
* no event exactly 60 m before the corpus max ts — the session-close
  rule (last_ts + 30 m gap vs max_ts - 30 m watermark) stays strict.
* documents: doc_id unique, text pure ASCII (the multimodal
  synthesizers and the char-wise regenerating oracles assume byte ==
  char; NOTES records ASCII as a stated precondition).
* embeddings: vec_id unique, probe ids 0 and 42 present, dim 64
  (the ANN family anchors on these).
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
]

MINUTE_US = 60_000_000
SESSION_GAP_US = 30 * MINUTE_US
WATERMARK_US = 30 * MINUTE_US


def _ts_us(tbl) -> np.ndarray:
    """Normalize the ts column to int64 epoch micros under either
    fixture encoding (NOTES invariant #3: timestamp[us] since r4,
    int64 nanos through r3)."""
    col = tbl.column("ts")
    if str(col.type).startswith("int"):
        return col.to_numpy() // 1000
    return col.cast("int64").to_numpy()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_preconditions(sf_dir):
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    ids = tbl.column("event_id").to_numpy()
    assert len(np.unique(ids)) == len(ids), (
        f"{sf_dir}: event_id not unique — the streaming dedup oracles "
        "(identity semantics) are invalid on this fixture"
    )
    ts = _ts_us(tbl)
    on_grid = ts % MINUTE_US == 0
    assert not on_grid.any(), (
        f"{sf_dir}: {int(on_grid.sum())} event ts on the 1-minute grid "
        "— a window boundary is exact and the streaming oracles' <=/< "
        "convention can flip rows"
    )
    users = tbl.column("user_id").to_numpy()
    order = np.lexsort((ts, users))
    su, st = users[order], ts[order]
    same_user = su[1:] == su[:-1]
    gap_exact = same_user & (st[1:] - st[:-1] == SESSION_GAP_US)
    assert not gap_exact.any(), (
        f"{sf_dir}: consecutive same-user events exactly 30 m apart — "
        "the session-window merge decision is boundary-exact"
    )
    close_exact = (ts.max() - ts) == (SESSION_GAP_US + WATERMARK_US)
    assert not close_exact.any(), (
        f"{sf_dir}: an event sits exactly gap+delay before max ts — "
        "the session-close-vs-watermark comparison is boundary-exact"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_preconditions(sf_dir):
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = tbl.column("doc_id").to_numpy()
    assert len(np.unique(ids)) == len(ids), f"{sf_dir}: doc_id not unique"
    texts = tbl.column("text").to_pylist()
    bad = [i for i, t in zip(ids, texts) if not t.isascii()]
    assert not bad, (
        f"{sf_dir}: non-ASCII documents {bad[:5]} — the char-wise "
        "regenerating multimodal oracles assume byte == char"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_preconditions(sf_dir):
    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    assert len(np.unique(ids)) == len(ids), f"{sf_dir}: vec_id not unique"
    present = set(ids.tolist())
    assert {0, 42} <= present, (
        f"{sf_dir}: ANN probe vec_ids missing ({sorted({0, 42} - present)})"
    )
    lens = {len(v) for v in tbl.column("embedding").to_pylist()[:50]}
    assert lens == {64}, f"{sf_dir}: embedding dims {lens} != {{64}}"
