"""Scalar-function coverage: string / date / math / conditional / JSON /
array functions, plus explode (UDTF-shaped) — SURVEY.md §2.B B2 at data
scale and the §2.G function-surface gap.

All expressions are built-in pyspark.sql.functions (JVM whole-stage
codegen, no Python in the hot path).  Floats are rounded on both sides for
hash stability; regex patterns are kept to the POSIX-ish subset DuckDB and
Spark interpret identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.plans.registry import register
from ab_metadata_pusher_spark.sources.fixtures import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "scalar_string_funcs",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       length(p_name) AS name_len,
       substr(p_type, 1, 5) AS type_prefix,
       split_part(p_name, ' ', 1) AS first_word,
       replace(p_brand, 'Brand#', 'B') AS brand_short,
       concat(p_brand, ':', p_type) AS brand_type,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
       trim('  ' || p_name || ' ') AS name_trimmed,
       reverse(p_brand) AS brand_rev
FROM part
""",
    covers=("B2", "G.fn.string"),
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.split(F.col("p_name"), " ").getItem(0).alias("first_word"),
        F.replace(F.col("p_brand"), F.lit("Brand#"), F.lit("B")).alias("brand_short"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.reverse("p_brand").alias("brand_rev"),
    )


@register(
    "scalar_date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS order_year,
       month(o_orderdate) AS order_month,
       day(o_orderdate) AS order_day,
       quarter(o_orderdate) AS order_quarter,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_ts,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
""",
    covers=("B2", "G.fn.date"),
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("timestamp_ntz").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_ts"),
        F.to_date("o_orderdate").alias("order_date"),
    )


@register(
    "scalar_math_funcs",
    oracle="""
SELECT p_partkey,
       round(p_retailprice, 1) AS price_r1,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
       abs(p_size - 25) AS size_dist,
       round(sqrt(p_retailprice), 6) AS price_sqrt,
       round(ln(p_retailprice), 6) AS price_ln,
       round(pow(p_size, 2), 1) AS size_sq,
       p_size % 7 AS size_mod,
       CAST(sign(p_size - 25) AS DOUBLE) AS size_sign,
       greatest(p_size, 10) AS size_min10,
       least(p_size, 40) AS size_max40
FROM part
""",
    covers=("B2", "G.fn.math"),
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.round("p_retailprice", 1).alias("price_r1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.pow("p_size", F.lit(2)), 1).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.signum(F.col("p_size") - 25).cast("double").alias("size_sign"),
        F.greatest("p_size", F.lit(10)).alias("size_min10"),
        F.least("p_size", F.lit(40)).alias("size_max40"),
    )


@register(
    "scalar_conditional",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice < 100000 THEN 'small'
            WHEN o_totalprice < 300000 THEN 'medium'
            ELSE 'large' END AS price_band,
       coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_label,
       (o_orderpriority = '1-URGENT') AS is_urgent,
       CASE WHEN o_orderstatus = 'F' THEN round(o_totalprice, 2) ELSE 0 END
         AS finished_price
FROM orders
""",
    covers=("B3", "G.fn.conditional"),
)
def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "small")
         .when(F.col("o_totalprice") < 300000, "medium")
         .otherwise("large").alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open"))
         .alias("status_label"),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
        F.when(F.col("o_orderstatus") == "F", F.round("o_totalprice", 2))
         .otherwise(F.lit(0.0)).alias("finished_price"),
    )


@register(
    "scalar_json_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
       (CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS k_high
FROM events
""",
    covers=("G.fn.json",),
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events props blob (FIXTURES.md).  At scale
    prefer from_json with an explicit schema once per pipeline over
    repeated get_json_object calls (single parse)."""
    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "k_value",
        F.from_json("props", "k INT").getField("k"))
    return parsed.select(
        "event_id", "k_value",
        (F.col("k_value") > 50).alias("k_high"))


@register(
    "array_funcs_embeddings",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
       round(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum'), 4) AS vec_sum,
       round(sqrt(list_aggregate(
         list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum')), 4)
         AS vec_norm
FROM embeddings
""",
    covers=("G.fn.array",),
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array math over the embedding column with F.aggregate/F.transform —
    the JVM-side (no-UDF) path for vector arithmetic."""
    e = _t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6)
         .alias("first_component"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 4)
         .alias("vec_sum"),
        F.round(F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)), 4)
         .alias("vec_norm"),
    )


@register(
    "explode_word_counts",
    oracle="""
SELECT word, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
""",
    covers=("G.udtf.explode",),
)
def q_explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UDTF-shaped generator) + re-aggregation — the tokenize->
    count shape of every corpus-statistics pipeline."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "posexplode_tokens",
    oracle="""
SELECT doc_id, CAST(pos - 1 AS INTEGER) AS pos, word
FROM (SELECT doc_id,
             unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents)
WHERE doc_id < 10 AND word <> ''
""",
    covers=("G.udtf.posexplode",),
)
def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    return (
        d.select("doc_id",
                 F.posexplode(F.split("text", " ")).alias("pos", "word"))
        .filter(F.col("word") != "")
    )


@register(
    "map_event_type_counts",
    oracle="""
SELECT user_id,
       count(DISTINCT event_type)::INT AS n_types,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
       CASE WHEN count(*) FILTER (event_type = 'click') = 0 THEN NULL
            ELSE count(*) FILTER (event_type = 'click') END AS n_click,
       CASE WHEN count(*) FILTER (event_type = 'error') = 0 THEN NULL
            ELSE count(*) FILTER (event_type = 'error') END AS n_error
FROM events GROUP BY user_id
""",
    covers=("G.fn.map",),
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns (absent from the reference, whose only 'map' is
    stringly CSV rows): per-user event_type->count map built with
    map_from_entries, then consumed with map_keys/size/element_at —
    element_at's NULL-on-missing is mirrored by the oracle's CASE."""
    ev = _t(spark, sf_dir, "events")
    counts = (ev.groupBy("user_id", "event_type")
                .agg(F.count(F.lit(1)).alias("c")))
    m = (counts.groupBy("user_id")
         .agg(F.map_from_entries(
             F.sort_array(F.collect_list(F.struct("event_type", "c"))))
             .alias("m")))
    return m.select(
        "user_id",
        F.size("m").alias("n_types"),
        F.array_join(F.sort_array(F.map_keys("m")), ",").alias("types_csv"),
        F.element_at("m", "click").alias("n_click"),
        F.element_at("m", "error").alias("n_error"),
    )


@register(
    "scalar_try_funcs",
    oracle="""
SELECT event_id,
       TRY_CAST(event_type AS INT) AS type_as_int,
       TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
       value / nullif(user_id, 0) AS per_user,
       TRY_CAST('2024-13-45' AS DATE) AS bad_date
FROM events
""",
    covers=("G.fn.try",),
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts/arithmetic: NULL instead of runtime failure — at
    100 TB a single malformed row must not kill a 6-hour job.  try_cast on
    non-numeric strings, try_divide by zero (user_id 0 exists in the
    fixture), and an impossible date."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.get_json_object("props", "$.k").try_cast("int").alias("k_int"),
        F.try_divide("value", F.nullif(F.col("user_id"), F.lit(0)))
         .alias("per_user"),
        F.lit("2024-13-45").try_cast("date").alias("bad_date"),
    )


@register(
    "scalar_regexp_funcs",
    oracle="""
SELECT event_id,
       array_to_string(regexp_extract_all(props, '[0-9]+'), '|') AS digit_runs,
       len(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs,
       regexp_replace(props, '[0-9]+', '#', 'g') AS masked,
       regexp_matches(props, '"k": [0-9]{2}') AS has_2digit_k
FROM events
""",
    covers=("G.fn.regexp",),
)
def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family over the props JSON blob: extract-all (joined
    to '|'-delimited string — the driver's pandas canonicalizer cannot
    hash list cells, CORRECTNESS_r03's one red row), match-count, global
    replace (masking — the same primitive the PII scrubber builds on),
    and boolean match.  Patterns stay in the RE2 ∩ java.util.regex
    common subset so both engines agree; all JVM-side codegen, no UDFs."""
    ev = _t(spark, sf_dir, "events")
    runs = F.regexp_extract_all("props", F.lit("[0-9]+"), 0)
    return ev.select(
        "event_id",
        F.array_join(runs, "|").alias("digit_runs"),
        F.size(runs).alias("n_digit_runs"),
        F.regexp_replace("props", "[0-9]+", "#").alias("masked"),
        F.col("props").rlike('"k": [0-9]{2}').alias("has_2digit_k"),
    )


@register(
    "scalar_variant_funcs",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       CAST(NULL AS INTEGER) AS missing_int,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod
FROM events
""",
    covers=("G.fn.variant",),
)
def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through the VARIANT type (Spark 4):
    parse_json once into a binary-encoded variant, then typed path
    extraction with variant_get / try_variant_get — the open-schema
    answer to from_json-with-a-fixed-schema when event properties drift.

    Scale rationale: variant parse happens ONCE per row into a columnar
    binary encoding; every downstream path access is a cheap typed probe
    (no re-parse, no string round-trip), which is the difference between
    O(paths) JSON parses and O(1) at 100 TB.  The oracle reads the same
    paths with DuckDB's JSON extraction — typed results must agree
    exactly; the variant encoding itself never leaves the plan."""
    ev = _t(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_int"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_int"),
        (F.variant_get(v, "$.k", "int") % 10).alias("k_mod"))


@register(
    "map_higher_order_funcs",
    oracle="""
SELECT user_id, event_type, n, avg_value
FROM (SELECT user_id, event_type, count(*) AS n,
             CAST((sum(CAST(round(value * 100, 0) AS BIGINT)) * 200
                   + count(*)) // (2 * count(*)) AS DOUBLE) / 10000
               AS avg_value
      FROM events GROUP BY user_id, event_type)
WHERE n >= 12
""",
    covers=("G.fn.map.higher_order",),
)
def q_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions end-to-end: build TWO per-user maps
    (event_type -> count, event_type -> sum) with map_from_entries,
    merge them positionally-by-key with map_zip_with into avg = sum/n,
    prune rare keys with map_filter, then explode back to rows.  The
    whole map pipeline is JVM-side codegen — no Python — and the oracle
    states the same result as a flat aggregation, so the driver verifies
    the map algebra against plain relational algebra.

    At 100 TB: maps keep per-user state one-row-wide (the groupBy
    shuffles once on user_id; key cardinality = event types, bounded),
    the form to prefer when downstream wants per-entity dictionaries
    (feature stores, per-user mixture weights) rather than tall rows.

    Sums accumulate FIXED-POINT cents (exact longs), not doubles:
    double summation order differs between engines and partitionings,
    and at 10× the gate's SF a group landed exactly on a round-half
    boundary — integer sums make the map algebra engine-exact at every
    scale (the same discipline money columns need in production)."""
    ev = _t(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    per = (ev.groupBy("user_id", "event_type")
           .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("s")))
    maps = (per.groupBy("user_id")
            .agg(F.map_from_entries(
                     F.collect_list(F.struct("event_type", "n"))).alias("cnt"),
                 F.map_from_entries(
                     F.collect_list(F.struct("event_type", "s"))).alias("sums")))
    # avg at 4 decimals via half-up INTEGER division, then one exact
    # int->double conversion: round(double, 4) straddles half boundaries
    # differently across engines (Spark rounds the shortest decimal repr,
    # DuckDB the binary double), but (2*s*100 + n) // (2*n) is engine-exact.
    zipped = F.map_zip_with(
        "cnt", "sums", lambda k, n, s: F.struct(
            n.alias("n"),
            (F.floor((s * 200 + n) / (n * 2)) / 10000.0).alias("avg_value")))
    kept = F.map_filter(zipped, lambda k, v: v.getField("n") >= 12)
    return (maps.select("user_id",
                        F.explode(kept).alias("event_type", "st"))
            .select("user_id", "event_type",
                    F.col("st.n").alias("n"),
                    F.col("st.avg_value").alias("avg_value")))
