"""Compile BASELINE.md's operative per-query rows into bench_baseline.json.

BASELINE.md accumulates benchmark records chronologically; later
sections SUPERSEDE earlier rows for the same query. bench.py uses the
compiled JSON as its re-run trigger: a measured row more than 2x its
baseline gets an automatic extra run before being recorded, so a
single GC/load spike can't stand as the round's artifact (VERDICT r7
item 1 — seven streaming rows recorded 2-15x on single samples).

Table rows (``| name | 1.23 ... |``) are parsed positionally — the
FIRST float in the value cell (range rows like ``2.71-4.12`` quote
the clean lower bound first). A handful of superseding rows live in
prose, not tables; those are pinned here explicitly with their
BASELINE.md anchors, applied only where no later table row exists.

Run from the repo root after adding rows to BASELINE.md:
    python scripts/build_bench_baseline.py
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Prose-only superseding rows (section anchors in BASELINE.md), applied
# AFTER the table parse — each was checked to have no later table row.
# MAINTENANCE RULE: when a later BASELINE.md table row lands for one of
# these keys, DELETE its entry here (the unconditional override would
# otherwise mask the new row — caught once already for
# text_lm_unigram_score's r8 portable-ln row).
PROSE_SUPERSEDES = {
    # r5: applyInArrow switch ("Round-5 additions", bullet list)
    "udtf_grouped_map": 1.5704,
    "udtf_cogrouped_map": 2.4258,
    "dedup_ngram_jaccard": 4.8316,
    "text_langid_ngram": 2.1702,
    "embed_neardup_cosine": 3.629,
    # r6: plan-change re-measurements ("Round-6 additions", bullets)
    "join_bucketed": 0.6454,
    "sim_ann_ivf": 1.2174,
    "sim_quantized_recall": 4.063,
    "stream_stateful_ema_batches": 4.4578,
    # r6 continuation closing-run warmed medians (prose paragraph)
    "graph_pagerank": 6.45,
    "stream_upsert_foreachbatch": 2.33,
    "multimodal_image_resize": 2.71,
    "scan_partition_prune": 0.43,
    # r7: superseding prose row ("Superseding row: agg_ema 0.89")
    "agg_ema": 0.89,
}

ROW_RE = re.compile(r"^\|\s*([a-z][a-z0-9_]+)\s*\|\s*([0-9]+\.[0-9]+)")


def main() -> None:
    baseline: dict[str, float] = {}
    with open(os.path.join(REPO, "BASELINE.md")) as f:
        for line in f:
            m = ROW_RE.match(line)
            if m and m.group(1) != "query":
                baseline[m.group(1)] = float(m.group(2))
    baseline.update(PROSE_SUPERSEDES)
    out = os.path.join(REPO, "bench_baseline.json")
    with open(out, "w") as f:
        json.dump(baseline, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"{out}: {len(baseline)} per-query baseline rows")


if __name__ == "__main__":
    main()
