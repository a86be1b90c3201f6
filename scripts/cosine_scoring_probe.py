"""Candidate-cosine scoring tiers, paired A/B on the real IVF kNN head.

Settles OPTIMIZATION_r13.md "Not yet optimized" item 1 (Arrow scoring
tier): on the quality_label_full candidate stream (4.0M pairs at sf0.1,
dim 64) the interpreted `cosine_prenorm` fold BEAT every alternative
tested, so the scoring stays on the JVM (guide §4: don't add a Python
boundary that costs more than it saves):

  fold (current)            min 3.5 s  (whole head, noop sink)
  mapInArrow numpy (here)   min 16.2 s — Arrow round trip of 4M x two
                            64-float arrays dwarfs the fold
  pandas_udf numpy          ~1.0x fold — per-row object extraction eats
                            the vectorization (earlier probe variant)
  unrolled 64-term codegen  1.6x SLOWER than fold (earlier variant)

The by-product worth keeping: the mapInArrow tier reproduces the JVM
fold BIT-FOR-BIT (elementwise product, then sequential per-dim
accumulation — the same cast/multiply/add rounding order; 0 / 3 998 000
exact mismatches including null/NaN/zero-sign classes), with JVM null
semantics mirrored from the Arrow validity bitmaps.  If dim or k ever
grows to where the boundary amortizes, this file is the equivalence
recipe.

emb is spread to cluster width like the bench does (spread_if_narrow),
so wall times are comparable to the bench head.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")

from ab_metadata_pusher_spark.session import get_spark
from ab_metadata_pusher_spark.sources.fixtures import load_table
from ab_metadata_pusher_spark.operators import similarity as S
from ab_metadata_pusher_spark.operators._shared import spread_if_narrow
from pyspark.sql import functions as F, Window

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="dot_probe3",
                  extra_conf={"spark.ui.enabled": "false",
                              "spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

emb = spread_if_narrow(load_table(spark, sf_dir, "embeddings"))
cents = S.ivf_centroid_list(emb, n_cells=8, iters=2)
DIM = len(cents[0][1])


def build_cand():
    build = S._assign_cells(
        emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("c_emb"),
                   S.l2_norm(F.col("embedding")).alias("c_norm")),
        cents, "neighbor_id", "c_emb", nprobe=1)
    query = S._assign_cells(
        emb.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("q_emb"),
                   S.l2_norm(F.col("embedding")).alias("q_norm")),
        cents, "query_id", "q_emb", nprobe=8)
    return (query.join(build, "cell")
            .filter(F.col("query_id") != F.col("neighbor_id")))


def _np_list(col, n):
    """(matrix float64 | None, row_ok bool mask, lengths) from an Arrow
    list<float>/list<double> array; matrix is None when irregular."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # top-level validity
    row_valid = np.ones(n, dtype=bool) if col.null_count == 0 else \
        np.asarray(col.is_valid())
    lens = np.asarray(pc.list_value_length(col).fill_null(-1))
    vals = col.values  # flat child (offsets may not start at 0: slice)
    off = np.asarray(col.offsets) if hasattr(col, "offsets") else None
    uniform = bool(row_valid.all() and (lens == DIM).all())
    elem_null_free = vals.null_count == 0
    if uniform and elem_null_free and off is not None \
            and off[0] + n * DIM == off[-1]:
        flat = vals.slice(off[0], n * DIM)
        m = np.asarray(flat, dtype=np.float64).reshape(n, DIM)
        return m, row_valid, lens
    return None, row_valid, lens


def score_batch(batch, a_name, b_name, na_name, nb_name):
    import numpy as np
    import pyarrow as pa

    n = batch.num_rows
    A, a_ok, a_len = _np_list(batch.column(a_name), n)
    B, b_ok, b_len = _np_list(batch.column(b_name), n)
    na = batch.column(na_name).to_numpy(zero_copy_only=False)
    nb = batch.column(nb_name).to_numpy(zero_copy_only=False)
    na_null = np.asarray(pa.compute.is_null(batch.column(na_name)))
    nb_null = np.asarray(pa.compute.is_null(batch.column(nb_name)))
    if A is not None and B is not None:
        P = A * B
        acc = np.zeros(n, dtype=np.float64)
        for d in range(DIM):            # sequential == JVM left fold
            acc = acc + P[:, d]
        res = acc / (na * nb)
        null_mask = na_null | nb_null
    else:
        # slow path: replicate the zip_with/fold null semantics per row
        av = batch.column(a_name).to_pylist()
        bv = batch.column(b_name).to_pylist()
        res = np.empty(n, dtype=np.float64)
        null_mask = na_null | nb_null
        for i in range(n):
            a, b = av[i], bv[i]
            if a is None or b is None or len(a) != len(b) \
                    or any(x is None for x in a) \
                    or any(x is None for x in b):
                null_mask[i] = True
                res[i] = 0.0
                continue
            acc = 0.0
            for x, y in zip(a, b):
                acc = acc + float(x) * float(y)
            res[i] = acc / (na[i] * nb[i])
    return pa.array(res, type=pa.float64(), mask=null_mask)


def with_arrow_cosine(cand, keep):
    import pyarrow as pa

    out_fields = [(k, cand.schema[k].dataType.simpleString()) for k in keep]
    schema = ", ".join(f"`{k}` {t}" for k, t in out_fields) \
        + ", `cosine_sim` double"

    def fn(batches):
        for batch in batches:
            if batch.num_rows == 0:
                continue
            cs = score_batch(batch, "q_emb", "c_emb", "q_norm", "c_norm")
            cols = [batch.column(k) for k, _ in out_fields] + [cs]
            yield pa.RecordBatch.from_arrays(
                cols, names=[k for k, _ in out_fields] + ["cosine_sim"])

    return cand.mapInArrow(fn, schema)


def head(mode):
    cand = build_cand()
    if mode == "fold":
        scored = cand.withColumn("cosine_sim", S.cosine_prenorm(
            F.col("q_emb"), F.col("c_emb"),
            F.col("q_norm"), F.col("c_norm")))
    else:
        scored = with_arrow_cosine(cand, ["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id",
                    F.round("cosine_sim", 6).alias("cosine_sim"), "rank"))


def run(df):
    t = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t


# exact equality: join fold result with arrow result on (query, neighbor)
cand = build_cand()
f = cand.withColumn("c1", S.cosine_prenorm(
    F.col("q_emb"), F.col("c_emb"), F.col("q_norm"), F.col("c_norm"))) \
    .select("query_id", "neighbor_id", "c1")
a = with_arrow_cosine(cand, ["query_id", "neighbor_id"]) \
    .withColumnRenamed("cosine_sim", "c2")
bad = (f.join(a, ["query_id", "neighbor_id"])
       .filter((F.col("c1").isNull() != F.col("c2").isNull())
               | (F.col("c1") != F.col("c2"))
               | (F.isnan("c1") != F.isnan("c2"))
               | ((F.col("c1") == 0.0)
                  & (F.col("c1").cast("string")
                     != F.col("c2").cast("string"))))
       .count())
tot = f.count()
print(f"exact mismatches: {bad} / {tot}", flush=True)

times = {"fold": [], "arrow": []}
for i in range(5):
    for m in ("fold", "arrow"):
        times[m].append(run(head(m)))
    print(f"round {i}: fold={times['fold'][-1]:.3f} "
          f"arrow={times['arrow'][-1]:.3f}", flush=True)
print("MIN  fold={:.3f}  arrow={:.3f}".format(
    min(times["fold"]), min(times["arrow"])))
spark.stop()
