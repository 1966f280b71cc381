"""Family H — scalar function surface (SURVEY.md §2.2.H).

Grounding: path/hotkey string formatting (reference neurons/miner.py:
56-64), regex egg-name extraction (reference setup.py:36-39), version
split arithmetic (reference template/__init__.py:23-24), consistency
hashing (reference README.md:22), block timestamps (reference
neurons/miner.py:182, neurons/validator.py:170), config trees
(reference neurons/miner.py:52), payload deserialization (reference
template/protocol.py:59-75).

Everything is a built-in pyspark.sql.functions expression — JVM-side,
inside whole-stage codegen; no Python UDFs on this surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_subnet_spark.operators.registry import query
from map_reduce_subnet_spark.sources.tables import load_table


@query(
    "str_basics",
    oracle="""
SELECT c_custkey,
       UPPER(c_name) AS up_name,
       LOWER(c_mktsegment) AS low_seg,
       SUBSTRING(c_name, 1, 8) AS prefix,
       LENGTH(c_name) AS name_len,
       CONCAT(TRIM(c_name), ':', c_mktsegment) AS tagged
FROM customer
""",
)
def str_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/substr/length/trim/concat."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("low_seg"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.trim(F.col("c_name")), F.lit(":"), F.col("c_mktsegment")).alias(
            "tagged"
        ),
    )


@query(
    "str_regex",
    oracle=r"""
SELECT c_custkey,
       regexp_extract(c_name, 'Customer#(\d+)', 1) AS digits,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS num,
       regexp_replace(c_name, '0+', '-', 'g') AS squeezed,
       c_name LIKE 'Customer#%1' AS ends_one
FROM customer
""",
)
def str_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / LIKE (the #egg= extraction)."""
    cu = load_table(spark, sf_dir, "customer")
    digits = F.regexp_extract("c_name", r"Customer#(\d+)", 1)
    return cu.select(
        "c_custkey",
        digits.alias("digits"),
        digits.cast("long").alias("num"),
        F.regexp_replace("c_name", "0+", "-").alias("squeezed"),
        F.col("c_name").like("Customer#%1").alias("ends_one"),
    )


@query(
    "str_split_explode",
    oracle="""
SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
FROM part
""",
)
def str_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode (file → chunks; version split)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("word")
    )


@query(
    "str_posexplode",
    oracle="""
SELECT p_partkey, pos, word
FROM (
    SELECT p_partkey,
           unnest(list_transform(range(1, len(w) + 1),
                                 i -> {'pos': i - 1, 'word': w[i]}),
                  recursive := true)
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
) t(p_partkey, pos, word)
""",
)
def str_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-aware explode — the chunk-index primitive (file D →
    numbered chunks, reference README.md:20)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word")
    ).withColumn("pos", F.col("pos").cast("long"))


@query(
    "gen_date_spine",
    oracle="""
WITH spine AS (
    SELECT strftime(unnest(generate_series(
        DATE '1995-01-01', DATE '1995-03-31', INTERVAL 1 DAY)),
        '%Y-%m-%d') AS day
), daily AS (
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS n
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
    GROUP BY 1
)
SELECT spine.day, COALESCE(daily.n, 0) AS n_orders
FROM spine LEFT JOIN daily ON spine.day = daily.day
""",
)
def gen_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine generation + gap fill: days with no orders appear
    with 0 (the every-tick reporting cadence). The spine is generated,
    not scanned — sequence() on a single row, exploded."""
    o = load_table(spark, sf_dir, "orders")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("1995-01-01").cast("date"),
                F.lit("1995-03-31").cast("date"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d")
    ).select(F.date_format("d", "yyyy-MM-dd").alias("day"))
    daily = (
        o.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    return spine.join(daily, "day", "left").select(
        "day", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders")
    )


@query(
    "project_try_cast",
    oracle="""
SELECT c_custkey,
       TRY_CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT)
           AS good_num,
       TRY_CAST(c_name AS BIGINT) AS bad_num,
       TRY_CAST(c_mktsegment AS DOUBLE) AS bad_dbl
FROM customer
""",
)
def project_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casting: try_cast yields NULL where a plain cast
    raises under Spark 4's default ANSI mode — the ingestion-hardening
    primitive for dirty columns."""
    cu = load_table(spark, sf_dir, "customer")
    return cu.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1)
        .try_cast("bigint")
        .alias("good_num"),
        F.col("c_name").try_cast("bigint").alias("bad_num"),
        F.col("c_mktsegment").try_cast("double").alias("bad_dbl"),
    )


@query(
    "str_hash",
    oracle="""
SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha
FROM documents
""",
)
def str_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content hashes — the consistency-id primitive (README.md:22)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha"),
    )


@query(
    "date_parts",
    oracle="""
SELECT o_orderkey,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
       CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
       CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS day_of_month,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
FROM orders
""",
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day extraction + month truncation."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("y"),
        F.month("o_orderdate").cast("long").alias("m"),
        F.dayofmonth("o_orderdate").cast("long").alias("day_of_month"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@query(
    "date_arith",
    oracle="""
SELECT o_orderkey,
       CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
           AS days_since_epoch0,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
       CAST(floor(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) / 7)
            AS BIGINT) AS week_bucket
FROM orders
""",
)
def date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff / +interval / bucketing (every-N-steps cadence)."""
    o = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).cast(
        "long"
    )
    return o.select(
        "o_orderkey",
        days.alias("days_since_epoch0"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
        F.floor(days / 7).cast("long").alias("week_bucket"),
    )


@query(
    "math_funcs",
    oracle="""
SELECT o_orderkey,
       ROUND(o_totalprice, 1) AS price_r1,
       CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
       ABS(o_totalprice - 200000.0) AS dist_from_200k,
       o_orderkey % 7 AS mod7,
       POWER(2.0, CAST(o_orderkey % 7 AS DOUBLE)) AS pow2,
       ROUND(SQRT(o_totalprice), 6) AS sqrt_p,
       ROUND(LN(o_totalprice), 6) AS ln_p
FROM orders
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/floor/abs/pow/mod/sqrt/ln (version-encode arithmetic).
    ln is rounded: libm implementations differ in the last ulp."""
    o = load_table(spark, sf_dir, "orders")
    mod7 = F.col("o_orderkey") % 7
    return o.select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.abs(F.col("o_totalprice") - 200000.0).alias("dist_from_200k"),
        mod7.alias("mod7"),
        F.pow(F.lit(2.0), mod7.cast("double")).alias("pow2"),
        F.round(F.sqrt("o_totalprice"), 6).alias("sqrt_p"),
        F.round(F.log("o_totalprice"), 6).alias("ln_p"),
    )


@query(
    "array_funcs",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       string_split(text, ' ')[1] AS first_word,
       list_sort(string_split(text, ' '))[1] AS min_word,
       list_contains(string_split(text, ' '), 'spark') AS has_spark
FROM documents
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element/sort/contains over split arrays (chunk arrays)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).cast("long").alias("n_words"),
        F.element_at(words, 1).alias("first_word"),
        F.element_at(F.array_sort(words), 1).alias("min_word"),
        F.array_contains(words, "spark").alias("has_spark"),
    )


@query(
    "array_hof",
    oracle="""
SELECT vec_id,
       list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS l1_norm,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       len(embedding) AS dim
FROM embeddings
""",
)
def array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order functions over the embedding vector: transform /
    filter / aggregate (the vectorized tensor ops of validator.py:146,
    151) — all JVM-side, no Python.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    l1 = F.aggregate(
        F.transform(emb, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_pos = F.size(F.filter(emb, lambda x: x > 0))
    # unrounded: identical fold order on both engines → bit-exact
    return e.select(
        "vec_id",
        l1.alias("l1_norm"),
        n_pos.cast("long").alias("n_positive"),
        F.size(emb).cast("long").alias("dim"),
    )


@query(
    "map_funcs",
    oracle="""
SELECT o_orderkey,
       CASE o_orderpriority
            WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 WHEN '3-MEDIUM' THEN 3
            WHEN '4-NOT SPECIFIED' THEN 4 WHEN '5-LOW' THEN 5 END::BIGINT AS prio_rank,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'fast'
            ELSE 'slow' END AS lane
FROM orders
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType lookup (config-tree access): a literal map column is
    probed with element_at; the oracle states the same mapping as CASE
    (DuckDB's map dialect differs, the values don't)."""
    o = load_table(spark, sf_dir, "orders")
    prio_map = F.create_map(
        F.lit("1-URGENT"), F.lit(1),
        F.lit("2-HIGH"), F.lit(2),
        F.lit("3-MEDIUM"), F.lit(3),
        F.lit("4-NOT SPECIFIED"), F.lit(4),
        F.lit("5-LOW"), F.lit(5),
    )
    lane_map = F.create_map(
        F.lit("1-URGENT"), F.lit("fast"), F.lit("2-HIGH"), F.lit("fast")
    )
    return o.select(
        "o_orderkey",
        F.element_at(prio_map, F.col("o_orderpriority")).cast("long").alias("prio_rank"),
        F.coalesce(
            F.element_at(lane_map, F.col("o_orderpriority")), F.lit("slow")
        ).alias("lane"),
    )


@query(
    "json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
       json_extract_string(props, '$.k') AS k_raw,
       CAST(json_extract_string(props, '$.k') AS BIGINT) * 2 AS k_doubled
FROM events
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON extraction via from_json with a declared schema (the
    deserialize() stage, protocol.py:59-75)."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        parsed["k"].alias("k_typed"),
        F.get_json_object("props", "$.k").alias("k_raw"),
        (parsed["k"] * 2).alias("k_doubled"),
    )


@query(
    "str_fuzzy_levenshtein",
    oracle="""
SELECT p_partkey, p_brand,
       levenshtein(p_brand, 'Brand#33') AS dist,
       levenshtein(p_brand, 'Brand#33') <= 1 AS is_near
FROM part
""",
)
def str_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (the string analog of the
    embedding near-dup family): distance of every brand to a target
    label plus a radius-1 match flag — the operator shape for fuzzy
    entity resolution over catalog strings. JVM-side levenshtein,
    identical DP definition in both engines."""
    p = load_table(spark, sf_dir, "part")
    d = F.levenshtein(F.col("p_brand"), F.lit("Brand#33"))
    # cast: Spark levenshtein emits INT, DuckDB BIGINT (see NOTES
    # dtype gotcha) — align so dtype-strict comparison can't flag it
    return p.select(
        "p_partkey",
        "p_brand",
        d.cast("long").alias("dist"),
        (d <= 1).alias("is_near"),
    )
