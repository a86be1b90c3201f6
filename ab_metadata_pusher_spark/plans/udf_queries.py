"""Vectorized-UDF surface (SURVEY.md §2.G "UDF/UDAF/UDTF: none in the
reference" — its C1 transform hook is where one would have lived,
job/sample_mysql_aws_sqs_job.py:74 passes no transformer).

Every UDF here is Arrow-batched (``pandas_udf``) — never row-at-a-time
Python — and each is oracled against the equivalent closed-form SQL, so the
driver verifies the Arrow path bit-for-bit (after 4-decimal rounding to
absorb float summation-order differences).

UDFs are constructed lazily inside each query: ``pandas_udf`` parses its
return-type DDL against the active SparkContext, so decorating at module
import would demand a session before one exists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ab_metadata_pusher_spark.plans.registry import register
from ab_metadata_pusher_spark.sources.fixtures import load_table


@register(
    "udf_grouped_geomean",
    oracle="""
SELECT l_returnflag,
       round(exp(avg(ln(l_quantity))), 4) AS geomean_qty,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
""",
    covers=("G.udf.grouped_agg",),
)
def q_grouped_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        # grouped-agg pandas UDF: geometric mean (inputs positive)
        return float(np.exp(np.log(v.to_numpy()).mean()))

    @pandas_udf("long")
    def n(v: pd.Series) -> int:
        # grouped-agg pandas UDFs can't mix with JVM aggregates in one
        # agg(); group size is a second pandas UDAF instead
        return len(v)

    li = load_table(spark, sf_dir, "lineitem")
    return (li.groupBy("l_returnflag")
              .agg(F.round(geomean("l_quantity"), 4).alias("geomean_qty"),
                   n("l_quantity").alias("n")))


@register(
    "udf_scalar_log1p",
    oracle="""
SELECT o_orderkey, round(ln(1 + o_totalprice), 4) AS log_price
FROM orders
""",
    covers=("G.udf.scalar",),
)
def q_scalar_log1p(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("double")
    def log1p(v: pd.Series) -> pd.Series:
        # scalar pandas UDF, one Arrow batch per call
        return np.log1p(v)

    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey",
                    F.round(log1p("o_totalprice"), 4).alias("log_price"))


@register(
    "udtf_span_split",
    oracle="""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, '. ')) AS sentence
  FROM documents WHERE doc_id < 50
)
SELECT doc_id, trim(sentence) AS sentence, length(trim(sentence)) AS n_chars
FROM t WHERE trim(sentence) <> ''
""",
    covers=("G.udtf.python",),
)
def q_udtf_span_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input document row -> N sentence
    rows.  The lateral-join shape every custom chunker (for RAG/pretrain
    pipelines) takes; built-ins can't express arbitrary per-row fan-out
    logic, a UDTF can."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence: string, n_chars: int")
    class SentenceSplit:
        def eval(self, text: str):
            for raw in text.split(". "):
                s = raw.strip()
                if s:
                    yield s, len(s)

    docs = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 50))
    spark.udtf.register("sentence_split", SentenceSplit)
    docs.createOrReplaceTempView("_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.sentence, s.n_chars
        FROM _udtf_docs d, LATERAL sentence_split(d.text) s
    """)


@register(
    "posexplode_outer_runs",
    oracle="""
SELECT event_id, u.s.pos AS pos, u.s.run AS run
FROM (SELECT event_id, regexp_extract_all(props, '[0-9]{2}') AS arr
      FROM events) t
LEFT JOIN LATERAL unnest(
    list_transform(arr, (x, ix) -> {'pos': ix - 1, 'run': x})) AS u(s)
  ON true
""",
    covers=("G.udtf.explode_outer",),
)
def q_posexplode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTER generator semantics: rows whose array is empty survive with
    NULL (pos, run) instead of disappearing — the difference between
    explode and explode_outer matters whenever the exploded attribute is
    optional (e.g. docs with zero images).  Same map-local Generate node
    as inner explode, so the scale story is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.regexp_extract_all("props", F.lit("[0-9]{2}"), 0)
    return ev.select("event_id",
                     F.posexplode_outer(arr).alias("pos", "run"))


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT vec_id,
       round(sqrt(list_aggregate(
           list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
           'sum')), 4) AS l2_norm,
       round(embedding[1] / sqrt(list_aggregate(
           list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
           'sum')), 6) AS first_unit
FROM embeddings
""",
    covers=("G.udf.map_in_arrow",),
)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy Arrow batch processing (``mapInArrow``): L2-normalize
    the embedding column operating directly on pyarrow RecordBatches —
    no pandas materialization at all, the lowest-overhead Python escape
    hatch Spark offers.  Each batch's list column is flattened to one
    contiguous numpy view, normalized vectorized, and rebuilt as a
    FixedSizeList-backed ListArray.

    This is the template for the multimodal decode path
    (operators/multimodal.py): when per-row payloads are large binaries,
    skipping the Arrow->pandas object-boxing both halves memory and
    avoids the object-dtype copy.  Partition-count preserved, no
    shuffle; at 100 TB tune spark.sql.execution.arrow.maxRecordsPerBatch
    so a batch of vectors fits the worker's L3."""
    import numpy as np
    import pyarrow as pa

    def normalize(batches):
        for batch in batches:
            vec_id = batch.column("vec_id")
            emb = batch.column("embedding")
            flat = np.asarray(emb.flatten(), dtype=np.float64) \
                .reshape(len(batch), -1)
            norms = np.sqrt((flat * flat).sum(axis=1))
            yield pa.RecordBatch.from_arrays(
                [vec_id,
                 pa.array(np.round(norms, 4)),
                 pa.array(np.round(flat[:, 0] / norms, 6))],
                ["vec_id", "l2_norm", "first_unit"])

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return e.mapInArrow(normalize,
                        "vec_id long, l2_norm double, first_unit double")
