"""Property-style differential tests: randomized query parameters,
Spark ≡ DuckDB on every draw.

This is the reference's validation pattern — fresh inputs every round
rather than a fixed corpus (the ever-advancing ``step`` input,
reference neurons/validator.py:124) — applied to the differential
oracle: each seed generates filter constants / group keys / window
sizes, and both engines must agree exactly.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest

from map_reduce_subnet_spark.functions.stable import sql_dsum
from map_reduce_subnet_spark.sources.tables import load_table
from tests.conftest import SF_DIR, assert_frames_match

import pyspark.sql.functions as F

SEEDS = [7, 42, 1337, 2024, 99991]


@pytest.mark.parametrize("seed", SEEDS)
def test_random_filter_agg_matches(spark, ddb, seed):
    """Random shipdate range + quantity threshold + group key choice."""
    rng = random.Random(seed)
    y0 = rng.randint(1995, 2000)
    y1 = rng.randint(y0, 2001)
    qty = rng.randint(5, 45)
    key = rng.choice(["l_returnflag", "l_linestatus", "l_suppkey"])
    lo, hi = f"{y0}-01-01", f"{y1}-07-01"

    li = load_table(spark, SF_DIR, "lineitem")
    got = (
        li.where(
            (F.col("l_shipdate") >= F.lit(lo).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(hi).cast("timestamp"))
            & (F.col("l_quantity") <= qty)
        )
        .groupBy(key)
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(27,6)"))
            .cast("double")
            .alias("total"),
        )
        .toPandas()
    )
    want = ddb.sql(
        f"""
        SELECT {key}, COUNT(*) AS n, {sql_dsum('l_extendedprice')} AS total
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
          AND l_quantity <= {qty}
        GROUP BY {key}
        """
    ).df()
    assert_frames_match(got, want, f"random_filter_agg seed={seed}")


@pytest.mark.parametrize("seed", SEEDS)
def test_random_topk_per_group_matches(spark, ddb, seed):
    """Random k and random ordering column for per-group top-k."""
    rng = random.Random(seed)
    k = rng.randint(1, 5)
    col = rng.choice(["o_totalprice", "o_orderdate"])

    o = load_table(spark, SF_DIR, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(col), F.asc("o_orderkey")
    )
    got = (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("o_custkey", "o_orderkey")
        .toPandas()
    )
    want = ddb.sql(
        f"""
        SELECT o_custkey, o_orderkey FROM (
            SELECT o_custkey, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY {col} DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= {k}
        """
    ).df()
    assert_frames_match(got, want, f"random_topk seed={seed}")


@pytest.mark.parametrize("seed", SEEDS)
def test_random_membership_join_matches(spark, ddb, seed):
    """Random segment subset semi-join."""
    rng = random.Random(seed)
    segs = rng.sample(
        ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"],
        rng.randint(1, 4),
    )
    seg_sql = ", ".join(f"'{s}'" for s in segs)

    cu = load_table(spark, SF_DIR, "customer")
    o = load_table(spark, SF_DIR, "orders")
    picked = cu.where(F.col("c_mktsegment").isin(*segs))
    got = (
        o.join(picked, o.o_custkey == picked.c_custkey, "left_semi")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .toPandas()
    )
    want = ddb.sql(
        f"""
        SELECT o_orderstatus, COUNT(*) AS n
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment IN ({seg_sql}))
        GROUP BY o_orderstatus
        """
    ).df()
    assert_frames_match(got, want, f"random_membership seed={seed}")


@pytest.mark.parametrize("seed", SEEDS)
def test_random_window_frame_matches(spark, ddb, seed):
    """Random rows-frame width for a per-user running decimal sum."""
    rng = random.Random(seed)
    width = rng.randint(1, 6)

    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-width, 0)
    )
    got = ev.select(
        "event_id",
        F.sum(F.col("value").cast("decimal(27,6)"))
        .over(w)
        .cast("double")
        .alias("s"),
    ).toPandas()
    want = ddb.sql(
        f"""
        SELECT event_id,
               CAST(SUM(CAST(value AS DECIMAL(27,6)))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {width} PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS s
        FROM events
        """
    ).df()
    assert_frames_match(got, want, f"random_window seed={seed}")


@pytest.mark.parametrize("seed", SEEDS)
def test_connected_components_matches_union_find_random_graph(spark, seed):
    """Random sparse graphs: the distributed label propagation must
    equal union-find exactly — membership and min-member cluster id —
    for every draw (chains, stars, merged blobs, singleton-free)."""
    from map_reduce_subnet_spark.operators.llm import connected_components

    rng = random.Random(seed)
    n = rng.randint(20, 80)
    m = rng.randint(n // 2, 2 * n)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.sample(range(n), 2)
        pairs.add((min(a, b), max(a, b)))
    pdf = pd.DataFrame(sorted(pairs), columns=["a_id", "b_id"])
    got = connected_components(
        spark.createDataFrame(pdf.astype("int64"))
    ).toPandas()
    from tests.conftest import union_find_labels

    expect = union_find_labels(pairs)
    assert {
        int(r["id"]): int(r["label"]) for _, r in got.iterrows()
    } == expect, f"seed={seed} n={n} m={m}"


@pytest.mark.parametrize("seed", SEEDS[:2])
def test_survivor_drops_matches_union_find(spark, seed):
    """Survivor selection on random graphs: the drop set must be
    exactly every vertex that is not its union-find component's
    minimum — one survivor per component, never zero, never two."""
    from map_reduce_subnet_spark.operators.llm import (
        connected_components,
        survivor_drops,
    )

    rng = random.Random(seed)
    n = rng.randint(20, 60)
    m = rng.randint(n // 2, 2 * n)
    pairs = set()
    while len(pairs) < m:
        a, b = rng.sample(range(n), 2)
        pairs.add((min(a, b), max(a, b)))
    pdf = pd.DataFrame(sorted(pairs), columns=["a_id", "b_id"])
    labels = connected_components(spark.createDataFrame(pdf.astype("int64")))
    got_drops = {
        int(r["doc_id"]) for r in survivor_drops(labels).collect()
    }
    from tests.conftest import union_find_labels

    expect = union_find_labels(pairs)
    expect_drops = {v for v, lab in expect.items() if v != lab}
    assert got_drops == expect_drops, f"seed={seed} n={n} m={m}"
    # exactly one survivor per component
    survivors = set(expect) - got_drops
    assert {expect[s] for s in survivors} == set(expect.values())
    assert len(survivors) == len(set(expect.values()))


def test_hll_sketch_merge_golden(spark):
    """The two-level HLL rollup is deterministic: pin the estimates at
    sf0.001 and require both within 2% of exact — the mergeability
    contract (union of per-nation sketches answers the global
    question) with its accuracy cost made visible."""
    from tests.conftest import SF_DIR

    from map_reduce_subnet_spark.operators import QUERIES
    from map_reduce_subnet_spark.operators.aggregations import (
        hll_rollup_estimates,
    )

    [r] = hll_rollup_estimates(spark, SF_DIR).collect()
    assert r["n_exact"] > 0
    for col in ("est_direct", "est_merged"):
        assert abs(r[col] - r["n_exact"]) / r["n_exact"] < 0.02
    # determinism: identical plan, identical sketch estimates
    [r2] = hll_rollup_estimates(spark, SF_DIR).collect()
    assert (r2["est_direct"], r2["est_merged"]) == (
        r["est_direct"],
        r["est_merged"],
    )
    # the registered query bound-checks the same rollup: both booleans
    # must hold (this is what the driver's SQL oracle now enforces)
    [b] = QUERIES["agg_hll_sketch_merge"](spark, SF_DIR).collect()
    assert b["n_exact"] == r["n_exact"]
    assert b["direct_ok"] and b["merged_ok"]


@pytest.mark.parametrize("seed", SEEDS)
def test_overlap_join_matches_naive_random_intervals(spark, seed):
    """The binned interval-overlap join must equal the naive O(n²)
    scan on random intervals — for ANY bucket width, including widths
    far smaller than the interval length (many buckets per interval,
    the exactly-once attribution's hard case) and far larger (all
    candidates in one bucket). Negative coordinates exercise the
    floor-vs-truncate division edge."""
    from map_reduce_subnet_spark.functions.intervals import overlap_join

    rng = random.Random(seed)
    width = rng.choice([3, 7, 50, 1000])

    def mk(n, idc):
        rows = []
        for i in range(n):
            s = rng.randint(-200, 200)
            e = s + rng.randint(0, 40)
            rows.append((i, s, e))
        return rows

    a_rows, b_rows = mk(60, "a"), mk(60, "b")
    a = spark.createDataFrame(a_rows, "a_id long, a_s long, a_e long")
    b = spark.createDataFrame(b_rows, "b_id long, b_s long, b_e long")
    got = sorted(
        (r["a_id"], r["b_id"], r["overlap"])
        for r in overlap_join(a, b, width=width).collect()
    )
    want = sorted(
        (ai, bi, min(ae, be) - max(as_, bs))
        for (ai, as_, ae) in a_rows
        for (bi, bs, be) in b_rows
        if as_ <= be and bs <= ae
    )
    assert got == want, f"width={width}"


@pytest.mark.parametrize("seed", SEEDS)
def test_assign_sessions_matches_naive_fold(spark, seed):
    """Sessionization must equal the per-key python fold on random
    event streams: duplicate timestamps (tiebreak order), singleton
    keys, and gaps exactly AT the threshold (strict >: equal gap does
    NOT split) all drawn by the generator."""
    from map_reduce_subnet_spark.functions.sessions import assign_sessions

    rng = random.Random(seed)
    gap = rng.choice([1, 5, 20])
    rows = []
    rid = 0
    for key in range(rng.randint(1, 6)):
        t = 0
        for _ in range(rng.randint(1, 40)):
            t += rng.choice([0, 1, gap, gap + 1, gap * 3])
            rows.append((rid, key, t))
            rid += 1
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "rid long, k long, t long")
    got = {
        r["rid"]: r["session_seq"]
        for r in assign_sessions(
            df, key="k", ts="t", gap=gap, tiebreak="rid"
        ).collect()
    }
    want = {}
    bykey = {}
    for rid_, key, t in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        prev_t, seq = bykey.get(key, (None, 0))
        if prev_t is None or t - prev_t > gap:
            seq += 1
        bykey[key] = (t, seq)
        want[rid_] = seq
    assert got == want, f"gap={gap}"


def test_pagerank_matches_numpy_power_iteration(spark):
    """graph_pagerank vs a plain-python power iteration replicating
    the engine's arithmetic (w/out_w transition in double, each
    contribution quantized at 6dp before the order-independent sum):
    the pinned top-20 must agree in ids and rank values."""
    import math

    import pyarrow.parquet as pq

    from map_reduce_subnet_spark.operators import QUERIES

    got = QUERIES["graph_pagerank"](spark, SF_DIR).toPandas()
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    ).to_pandas()
    orders = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    w: dict[tuple[int, int], int] = {}
    for c, s in zip(j["o_custkey"], j["l_suppkey"]):
        k = (int(c), int(s) + 10_000_000)
        w[k] = w.get(k, 0) + 1
    edges: dict[tuple[int, int], int] = {}
    for (c, s), n in w.items():
        edges[(c, s)] = n
        edges[(s, c)] = n
    ow: dict[int, int] = {}
    for (src, _), n in edges.items():
        ow[src] = ow.get(src, 0) + n
    nodes = sorted(ow)
    n_nodes = len(nodes)

    def q6(x: float) -> float:
        return math.floor(x * 1e6 + 0.5) / 1e6

    rank = {v: 1.0 / n_nodes for v in nodes}
    for _ in range(5):
        s: dict[int, float] = {}
        for (src, dst), n in edges.items():
            s[dst] = s.get(dst, 0.0) + q6(rank[src] * (n / ow[src]))
        rank = {
            v: (1.0 - 0.85) / n_nodes + 0.85 * round(s.get(v, 0.0), 6)
            for v in nodes
        }
    want = sorted(
        ((r, vid) for vid, r in rank.items()),
        key=lambda t: (-t[0], t[1]),
    )[:20]
    assert got["node_id"].tolist() == [vid for _, vid in want]
    for g, (r, _) in zip(got["rank"], want):
        assert g == pytest.approx(r, abs=2e-6)


def test_scd2_intervals_partition_each_users_timeline(spark):
    """SCD2 invariants per user: intervals are chronologically chained
    (each row's valid_to equals the next row's valid_from — no gaps,
    no overlaps), exactly ONE open row (is_current, valid_to NULL),
    and every interval is non-degenerate or a zero-width tie is
    impossible because (ts, event_id) is a total order."""
    from tests.conftest import SF_DIR

    from map_reduce_subnet_spark.operators import QUERIES

    rows = QUERIES["merge_scd2_history"](spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: (r["valid_from_us"], r["event_id"]))
        opens = [r for r in hist if r["is_current"]]
        assert len(opens) == 1, user
        assert opens[0] is hist[-1]
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to_us"] == b["valid_from_us"], user
            assert not a["is_current"]
            assert a["valid_from_us"] <= a["valid_to_us"], user


def test_portable_ln_bit_identical_across_engines(spark, ddb):
    """The portable ln (functions/stable.py) must produce BIT-IDENTICAL
    doubles in Spark SQL, DuckDB SQL and plain Python over a dense
    integer range plus large sentinels — the foundation under the
    text_lm_unigram_score / text_entropy_unigram / text_zipf_slope
    oracles. Regression for the Spark decimal-literal trap: a bare
    `1.0` parses as DECIMAL(2,1) in Spark SQL, so un-cast literals
    fold to subtly different constants (~1e-13) that accumulated to
    ~1e-8 in the series — every literal must stay spelled
    CAST(x AS DOUBLE)."""
    import math
    import struct

    from map_reduce_subnet_spark.functions.stable import (
        portable_ln_py,
        portable_ln_stages,
    )

    xs = list(range(1, 2001)) + [2**31 - 1, 2**45 + 999, 2**62 + 12345]
    # python mirror is within 1e-8 of true ln everywhere on the range
    for x in xs[::97] + xs[-3:]:
        assert portable_ln_py(x) == pytest.approx(math.log(x), abs=1e-8)

    # DuckDB
    ctes, prev = [], "base"
    for i, (n, e) in enumerate(portable_ln_stages("x", "x_", "duckdb")):
        ctes.append(f"p{i} AS (SELECT *, {e} AS {n} FROM {prev})")
        prev = f"p{i}"
    vals = ", ".join(f"({x})" for x in xs)
    q = (
        f"WITH base AS (SELECT CAST(x AS BIGINT) AS x FROM (VALUES {vals})"
        f" t(x)), " + ", ".join(ctes) + f" SELECT x, x_ln FROM {prev}"
    )
    for x, v in ddb.sql(q).fetchall():
        assert struct.pack("<d", v) == struct.pack(
            "<d", portable_ln_py(int(x))
        ), f"duckdb ln({x}) diverged"

    # Spark
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    for n, e in portable_ln_stages("x", "x_", "spark"):
        df = df.withColumn(n, F.expr(e))
    for r in df.select("x", "x_ln").collect():
        assert struct.pack("<d", r["x_ln"]) == struct.pack(
            "<d", portable_ln_py(int(r["x"]))
        ), f"spark ln({r['x']}) diverged"


def test_kcore_matches_python_peel(spark):
    """graph_kcore vs a plain-python Matula-Beck peel over the SAME
    candidate-pair edge list: the surviving node set and every
    in-core degree must agree exactly. Also pins the pair table's
    a<b uniqueness, which the COUNT(*)-as-degree arithmetic assumes."""
    from map_reduce_subnet_spark.operators import QUERIES
    from map_reduce_subnet_spark.operators.analytics import KCORE_K
    from map_reduce_subnet_spark.operators.llm import (
        _candidate_pairs_cached,
    )

    got = {
        int(r["node_id"]): int(r["core_deg"])
        for r in QUERIES["graph_kcore"](spark, SF_DIR).collect()
    }
    pairs = [
        (int(r["a_id"]), int(r["b_id"]))
        for r in _candidate_pairs_cached(spark, SF_DIR).collect()
    ]
    assert len(pairs) == len(set(pairs)), "pair table has duplicates"
    assert all(a < b for a, b in pairs), "pair table not canonical a<b"
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if n in adj and len(adj[n]) < KCORE_K:
                for m in adj.pop(n):
                    if m in adj:
                        adj[m].discard(n)
                changed = True
    want = {n: len(neigh) for n, neigh in adj.items()}
    assert got == want


def test_trend_ols_matches_numpy_polyfit(spark):
    """agg_trend_ols vs numpy's least-squares fit per event_type: the
    engine computes closed-form slope/intercept/r2 from decimal-exact
    power sums; numpy solves the same normal equations via lstsq on
    centered data, so agreement is limited only by the conditioning of
    the uncentered day values (~2e4) — 1e-6 relative is the envelope."""
    import pyarrow.parquet as pq

    from map_reduce_subnet_spark.operators import QUERIES

    got = (
        QUERIES["agg_trend_ols"](spark, SF_DIR)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ev["day"] = ev["ts"].astype("datetime64[us]").astype("int64") // 86400000000
    assert set(got.index) == set(ev["event_type"].unique())
    for et, g in ev.groupby("event_type"):
        if g["day"].nunique() < 2:
            continue  # degenerate fit: slope undefined either way
        x = g["day"].to_numpy(dtype=np.float64)
        y = g["value"].to_numpy(dtype=np.float64)
        slope, intercept = np.polyfit(x - x.mean(), y, 1)
        intercept -= slope * x.mean()
        r = np.corrcoef(x, y)[0, 1]
        row = got.loc[et]
        assert row["n"] == len(g)
        assert abs(row["slope"] - slope) <= 1e-6 * max(1.0, abs(slope))
        assert abs(row["intercept"] - intercept) <= 1e-6 * max(
            1.0, abs(intercept)
        )
        assert abs(row["r_squared"] - r * r) <= 1e-6


def test_trend_ols_degenerate_group_is_null(spark, tmp_path):
    """Tie-corpus catch (late r9): a group whose rows all share one
    day has zero x-variance — slope is undefined and must come back
    NULL (the REGR_SLOPE convention), never an ANSI DIVIDE_BY_ZERO
    abort. A same-day group is a certainty somewhere in 100 TB. The
    healthy group in the same table must still fit exactly."""
    import pandas as pd
    import pyarrow.parquet as pq

    from map_reduce_subnet_spark.operators import QUERIES

    base = pd.Timestamp("2024-03-01")
    rows = []
    # degenerate: 5 'error' events inside one day (distinct times)
    for i in range(5):
        rows.append(("error", base + pd.Timedelta(minutes=7 * i), 10.0 + i))
    # healthy: 4 'view' events across 4 days, exact line y = 2x + 1
    # where x is the query's day bucket: epoch_us // 86400000000, i.e.
    # whole days since the epoch (ns value // 86_400e9 gives the same
    # integer) — keep this in sync with agg_trend_ols's x-axis.
    for d in range(4):
        epoch_day = (base + pd.Timedelta(days=d)).value // 86_400_000_000_000
        rows.append(
            ("view", base + pd.Timedelta(days=d, hours=3), 1.0 + 2.0 * epoch_day)
        )
    ev = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    ev["event_id"] = np.arange(len(ev), dtype=np.int64)
    ev["user_id"] = np.int64(1)
    ev["props"] = "{}"
    ev["ts"] = ev["ts"].astype("datetime64[us]")
    d = tmp_path / "fx"
    d.mkdir()
    ev[["event_id", "ts", "user_id", "event_type", "value", "props"]].to_parquet(
        d / "events.parquet"
    )
    got = (
        QUERIES["agg_trend_ols"](spark, str(d))
        .toPandas()
        .set_index("event_type")
    )
    err = got.loc["error"]
    assert err["n"] == 5
    assert pd.isna(err["slope"]) and pd.isna(err["intercept"]) and pd.isna(
        err["r_squared"]
    ), f"degenerate group must be NULL, got {err.to_dict()}"
    view = got.loc["view"]
    assert view["n"] == 4
    assert abs(view["slope"] - 2.0) < 1e-9
    assert abs(view["r_squared"] - 1.0) < 1e-9


def test_shingle_and_trigram_hofs_scale_linearly(spark):
    """The r10 scale-killer regression pin: expressions referenced
    from INSIDE a Spark HOF lambda re-evaluate per element, so the
    original shingles()/char_trigrams() re-split (or re-walked) the
    whole text for every output element — O(n²) per document
    (measured: 16k words = 49.8 s, 160k chars = 60.8 s; a 60k-word
    web document pushed dedup_near_minhash past 10 MINUTES). The
    let-binding forms are linear (0.2 s at those sizes, 64k words /
    640k chars in under a second). This test pins both the VALUES
    (against small hand-built expectations) and the time envelope —
    generous 30 s ceilings that only a reintroduced quadratic can
    blow (it measured 50-60 s at exactly these sizes on this box)."""
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from map_reduce_subnet_spark.functions import text as tx

    # values: a tiny doc, exact expectations
    small = spark.createDataFrame(
        pd.DataFrame({"t": ["a b c d", "x y", ""]})
    )
    got = small.select(
        tx.shingles("t", 3).alias("sh"), tx.char_trigrams("t").alias("tg")
    ).collect()
    assert got[0]["sh"] == ["a b c", "b c d"]
    assert got[0]["tg"] == ["a b", " b ", "b c", " c ", "c d"]
    assert got[1]["sh"] == [] and got[2]["sh"] == []

    # scale: 16k words / 160k chars. RATIO envelope, not a bare
    # wall-clock ceiling (ADVICE r10: an absolute 30 s bound flakes
    # on a loaded box, where even the linear form can blow it): time
    # a 4x-smaller input on the SAME session — linear scaling gives
    # ~4x between them, a reintroduced quadratic gives ~16x (and
    # measured 50-60 s absolute at these sizes). Box slowness inflates
    # numerator and denominator together, so the ratio is load-proof;
    # the fast-path absolute bound short-circuits timer noise when
    # the big input already ran at linear speed.
    def _timed(col_expr, text_val):
        one = spark.createDataFrame(pd.DataFrame({"t": [text_val]}))
        t0 = time.time()
        n = one.select(F.size(col_expr).alias("n")).collect()[0]["n"]
        return n, time.time() - t0

    txt_w = " ".join(f"w{i % 97}" for i in range(16_000))
    txt_c = "abcdefgh" * 20_000
    _, t_sh_small = _timed(tx.shingles("t", 3), " ".join(
        f"w{i % 97}" for i in range(4_000)))
    n_sh, t_sh = _timed(tx.shingles("t", 3), txt_w)
    _, t_tg_small = _timed(tx.char_trigrams("t"), "abcdefgh" * 5_000)
    n_tg, t_tg = _timed(tx.char_trigrams("t"), txt_c)
    assert n_sh == 15_998 and n_tg == 8
    assert t_sh < 5 or t_sh < 10 * max(t_sh_small, 0.5), (
        f"shingles 16k words took {t_sh:.1f}s vs {t_sh_small:.1f}s at "
        "4k — super-linear, quadratic reintroduced?"
    )
    assert t_tg < 5 or t_tg < 10 * max(t_tg_small, 0.5), (
        f"trigrams 160k chars took {t_tg:.1f}s vs {t_tg_small:.1f}s at "
        "40k — super-linear, quadratic reintroduced?"
    )


def test_int8_dequantized_scales_linearly_and_roundtrips(spark):
    """The r12 HOF-audit pin (invariant #13 applied to similarity.py):
    int8_dequantized's scale captured array_max over the WHOLE vector
    inside the per-element lambda — O(dim²) per row (measured 27.8 s
    for 200 rows at dim 2048 vs 0.32 s let-bound). Pins the VALUES
    (hand-computed expectations incl. the zero-vector and empty-array
    edges) and the linear envelope via the same load-proof ratio
    discipline as the shingle pin."""
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from map_reduce_subnet_spark.functions import similarity as sim

    # values: scale = 4/127; components dequantize to round(x/s)*s
    df = spark.createDataFrame(
        pd.DataFrame({"v": [[1.0, -2.0, 4.0], [0.0, 0.0], []]})
    ).select(F.col("v").cast("array<float>").alias("v"))
    got = df.select(sim.int8_dequantized(F.col("v")).alias("d")).collect()
    s = 4.0 / 127.0
    want0 = [round(1.0 / s) * s, round(-2.0 / s) * s, round(4.0 / s) * s]
    assert all(abs(a - b) < 1e-12 for a, b in zip(got[0]["d"], want0))
    assert got[1]["d"] == [0.0, 0.0]  # zero vector: scale-0 branch
    assert got[2]["d"] == []  # empty array survives

    def _timed(dim):
        big = spark.range(100).select(
            F.transform(
                F.sequence(F.lit(1), F.lit(dim)),
                lambda i: (
                    F.pmod(F.col("id") * i, F.lit(997)).cast("double")
                    / F.lit(100.0)
                ).cast("float"),
            ).alias("v")
        ).localCheckpoint()
        t0 = time.time()
        big.select(
            F.sum(
                F.aggregate(
                    sim.int8_dequantized(F.col("v")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
        ).collect()
        return time.time() - t0

    t_small = _timed(512)
    t_big = _timed(2048)  # 4x the dim: linear ~4x, quadratic ~16x
    assert t_big < 5 or t_big < 10 * max(t_small, 0.5), (
        f"int8_dequantized dim 2048 took {t_big:.1f}s vs {t_small:.1f}s "
        "at dim 512 — super-linear, captured-scale quadratic again?"
    )


def _cep_events(rows):
    """Minimal full-schema events frame for planted CEP fixtures."""
    import json as _json

    return pd.DataFrame(
        {
            "event_id": np.array([r[0] for r in rows], dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
            "user_id": np.array([r[2] for r in rows], dtype=np.int64),
            "event_type": [r[3] for r in rows],
            "value": np.full(len(rows), 1.5),
            "props": [_json.dumps({"k": i}) for i in range(len(rows))],
        }
    )


def test_events_cep_gapped_matches_planted_chains(spark, tmp_path):
    """Planted chains pin each clause of the GAPPED (skip-till-next)
    CEP predicate: non-contiguity (interlopers do NOT break a match),
    the per-stage 12 h gap bound, NO-BACKTRACKING (the first click
    after the anchor IS the match — a later click with a valid
    purchase cannot rescue it), and the strict-after sequence rule."""
    from map_reduce_subnet_spark.operators import QUERIES

    t0 = pd.Timestamp("2024-03-01 00:00:00.000137")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: gapped match WITH interlopers between every stage
        (10, t0, 1, "view"),
        (11, t0 + h, 1, "error"),
        (12, t0 + 2 * h, 1, "click"),
        (13, t0 + 3 * h, 1, "signup"),
        (14, t0 + 4 * h, 1, "purchase"),
        # user 2: click 13 h after view > 12 h gap: NO match
        (20, t0, 2, "view"),
        (21, t0 + 13 * h, 2, "click"),
        (22, t0 + 14 * h, 2, "purchase"),
        # user 3: purchase 13 h after click > 12 h gap: NO match
        (30, t0, 3, "view"),
        (31, t0 + h, 3, "click"),
        (32, t0 + 14 * h, 3, "purchase"),
        # user 4: NO-BACKTRACKING — first click after the view has no
        # purchase within ITS 12 h gap; the later click would chain
        # to the purchase, but skip-till-next never revisits
        (40, t0, 4, "view"),
        (41, t0 + h, 4, "click"),
        (42, t0 + 11 * h, 4, "click"),
        (43, t0 + 14 * h, 4, "purchase"),
        # user 5: purchase BEFORE the click does not close a match;
        # the one after it does (strict sequence order per stage)
        (50, t0, 5, "view"),
        (51, t0 + h, 5, "purchase"),
        (52, t0 + 2 * h, 5, "click"),
        (53, t0 + 3 * h, 5, "purchase"),
        # user 6: two anchors share the SAME click+purchase (each
        # view matches independently; stages are not consumed)
        (60, t0, 6, "view"),
        (61, t0 + h, 6, "view"),
        (62, t0 + 2 * h, 6, "click"),
        (63, t0 + 3 * h, 6, "purchase"),
    ]
    d = tmp_path / "cep_gapped_fixture"
    d.mkdir()
    _cep_events(rows).to_parquet(d / "events.parquet")
    got = sorted(
        (
            r["user_id"],
            r["anchor_event_id"],
            r["mid_event_id"],
            r["close_event_id"],
            r["span_us"],
        )
        for r in QUERIES["events_cep_gapped"](spark, str(d)).collect()
    )
    us_h = 3600 * 1_000_000
    assert got == [
        (1, 10, 12, 14, 4 * us_h),
        (5, 50, 52, 53, 3 * us_h),
        (6, 60, 62, 63, 3 * us_h),
        (6, 61, 62, 63, 2 * us_h),
    ], got


def test_events_cep_pattern_matches_planted_chains(spark, tmp_path):
    """Planted chains pin each clause of the CEP predicate: stage
    order, CONTIGUITY (an interloper event of the same user breaks a
    match; another user's interleaved event does not), the 24 h span
    bound, and the (ts, event_id) tie-break."""
    from map_reduce_subnet_spark.operators import QUERIES

    t0 = pd.Timestamp("2024-03-01 00:00:00.000137")
    h = pd.Timedelta(hours=1)
    rows = [
        # user 1: clean match, span 2 h
        (10, t0, 1, "view"),
        (11, t0 + h, 1, "click"),
        (12, t0 + 2 * h, 1, "purchase"),
        # user 2: right order, 13 h gaps -> span 26 h > 24 h: NO match
        (20, t0, 2, "view"),
        (21, t0 + 13 * h, 2, "click"),
        (22, t0 + 26 * h, 2, "purchase"),
        # user 3: interloper breaks contiguity: NO match
        (30, t0, 3, "view"),
        (31, t0 + h, 3, "error"),
        (32, t0 + 2 * h, 3, "click"),
        (33, t0 + 3 * h, 3, "purchase"),
        # user 4 matches even though user 5's event interleaves in ts
        (40, t0, 4, "view"),
        (50, t0 + h / 2, 5, "signup"),
        (41, t0 + h, 4, "click"),
        (42, t0 + 2 * h, 4, "purchase"),
        # user 6: wrong order: NO match
        (60, t0, 6, "click"),
        (61, t0 + h, 6, "view"),
        (62, t0 + 2 * h, 6, "purchase"),
        # user 7: view/click share a timestamp; event_id breaks the
        # tie into the matching order
        (70, t0, 7, "view"),
        (71, t0, 7, "click"),
        (72, t0 + h, 7, "purchase"),
    ]
    d = tmp_path / "cep_fixture"
    d.mkdir()
    _cep_events(rows).to_parquet(d / "events.parquet")
    got = sorted(
        (r["user_id"], r["anchor_event_id"], r["span_us"])
        for r in QUERIES["events_cep_pattern"](spark, str(d)).collect()
    )
    assert got == [
        (1, 10, 2 * 3600 * 1_000_000),
        (4, 40, 2 * 3600 * 1_000_000),
        (7, 70, 3600 * 1_000_000),
    ], got


def test_dynamic_partition_overwrite_leaves_untouched_files(
    spark, tmp_path
):
    """The layout-level half of the dynamic-overwrite contract, which
    the query's aggregate cannot distinguish from a
    rewrite-with-identical-data: the revision write must REPLACE the
    part files of the partitions it carries and leave the other
    partitions' files PHYSICALLY untouched (same names — a full-table
    rewrite would re-emit them under fresh task UUIDs)."""
    import glob
    import os

    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    root = str(tmp_path / "dpo_tbl")
    ev.write.partitionBy("event_type").parquet(root)

    def files(ptn):
        return sorted(
            os.path.basename(p)
            for p in glob.glob(
                os.path.join(root, f"event_type={ptn}", "part-*")
            )
        )

    error_before = files("error")
    click_before = files("click")
    assert error_before and click_before, "fixture lacks partitions"

    revision = ev.where(
        F.col("event_type").isin("click", "view")
    ).withColumn("value", F.col("value") * F.lit(2.0))
    (
        revision.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(root)
    )

    assert files("error") == error_before, (
        "dynamic overwrite rewrote an untouched partition"
    )
    assert files("click") != click_before, (
        "dynamic overwrite did not replace a touched partition"
    )
    # and the data halves: untouched partition keeps original values,
    # touched partition carries exactly the revised rows (no append)
    back = spark.read.parquet(root)
    n_click_src = ev.where(F.col("event_type") == "click").count()
    assert (
        back.where(F.col("event_type") == "click").count() == n_click_src
    ), "touched partition row count changed (append or drop)"
