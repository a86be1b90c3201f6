"""Distributed k-means (Lloyd iterations) over an embedding column.

The reference has no vector ops at all (SURVEY.md §2.G north star); this
is the Spark-first shape for clustering a 100 TB embedding corpus:

* **Assign** is a pure map: the k centroids are inlined into the plan as
  an array-of-structs literal and each row folds over it with
  ``F.aggregate`` to find its argmin — NO join, NO shuffle, no UDF.  A
  window/groupBy argmin would shuffle the whole corpus once per
  iteration; this shuffles zero rows.
* **Update** is one map-side-combinable shuffle of (corpus x dim)
  scalars: posexplode to (cluster, pos, value), avg, re-assemble.

Centroids are k x dim doubles (a few KiB) — collecting them to the driver
between iterations is the correct distributed design, not a shortcut
(same contract as ml.clustering.KMeans, which this intentionally mirrors
without the MLlib Vector UDT so results stay oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ab_metadata_pusher_spark.operators.similarity import _dbl

__all__ = ["seed_centroids", "assign_clusters", "update_centroids",
           "kmeans_fit_assign"]


def seed_centroids(corpus: DataFrame, k: int,
                   id_col: str = "vec_id",
                   emb_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic seeding: the vectors with the k smallest ids, cluster
    j seeded from id j (reproducible everywhere, unlike random init)."""
    rows = (corpus.filter(F.col(id_col) < k)
            .select(id_col, _dbl(F.col(emb_col)).alias("v")).collect())
    return [(int(r[id_col]), [float(x) for x in r["v"]]) for r in rows]


def _centroid_literal(centroids: list[tuple[int, list[float]]]) -> Column:
    # One SQL string parsed JVM-side: building k x dim nested F.lit/
    # F.struct trees costs hundreds of py4j round trips PER literal
    # (measured ~0.5s of pure driver time at 8x64 before any job runs).
    # repr(float) is the shortest round-trip form and Double.parseDouble
    # recovers the identical bits, so the plan literal is bit-exact.
    parts = ", ".join(
        "named_struct('cluster', {c}, 'cvec', array({vs}))".format(
            c=int(c), vs=", ".join(f"{float(x)!r}D" for x in vec))
        for c, vec in centroids)
    return F.expr(f"array({parts})")


def assign_clusters(corpus: DataFrame,
                    centroids: list[tuple[int, list[float]]],
                    id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    keep_emb: bool = False) -> DataFrame:
    """Map-only nearest-centroid assignment by Euclidean distance.

    Ties break toward the lower cluster id (strict ``<`` while folding in
    ascending cluster order), matching the oracle's ``ORDER BY dist,
    cluster`` tiebreak.  Output: id, cluster, dist (unrounded double);
    ``keep_emb`` carries the embedding column through (the Lloyd-update
    caller wants it so the update needs no corpus re-join).
    """
    cents = _centroid_literal(sorted(centroids))
    v = _dbl(F.col(emb_col))

    def sq_dist(c: Column) -> Column:
        return F.aggregate(
            F.zip_with(v, c["cvec"], lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x)

    # array_min over (d2, cluster) structs is the argmin: struct ordering
    # compares d2 first, then cluster — the lower cluster id wins ties,
    # matching the oracle's ORDER BY dist, cluster.  Each distance is
    # evaluated exactly once (a fold with F.when would inline the
    # distance expression twice per step).
    best = F.array_min(F.transform(
        cents, lambda c: F.struct(sq_dist(c).alias("d2"),
                                  c["cluster"].alias("cluster"))))
    cols = [F.col(id_col),
            best["cluster"].alias("cluster"),
            F.sqrt(best["d2"]).alias("dist")]
    if keep_emb:
        cols.append(F.col(emb_col))
    return corpus.select(*cols)


def update_centroids(corpus: DataFrame, assigned: DataFrame,
                     id_col: str = "vec_id",
                     emb_col: str = "embedding",
                     dim: int | None = None) -> list[tuple[int, list[float]]]:
    """Lloyd update: per-cluster element-wise mean as ONE cluster-keyed
    shuffle of ``dim`` per-dimension ``sum`` columns plus a count — all
    map-side combinable, k x (dim+1) scalars on the wire, and crucially
    NO row inflation: the earlier posexplode formulation materialized
    corpus x dim rows and paid a second cluster-keyed shuffle to
    re-assemble the vector.  The k x dim result is driver-sized by
    construction.  (Trade-off: very wide embeddings — thousands of
    dims — generate one aggregate expression per dimension; past
    codegen's ~hundreds-of-expressions comfort zone the exploded
    (cluster, pos) shuffle becomes the better shape again.)

    When ``assigned`` already carries ``emb_col`` (assign_clusters with
    ``keep_emb=True`` — assignment is a map-only projection OF the
    corpus, so the column is free), the per-iteration corpus re-join is
    skipped; the joined fallback stays for callers holding a bare
    (id, cluster) frame.  ``dim`` callers that know the width (every
    trainer does, from its seed centroids) should pass it; otherwise a
    single bounded first() infers it."""
    if emb_col in assigned.columns:
        joined = assigned
    else:
        joined = corpus.join(assigned.select(id_col, "cluster"), id_col)
    if dim is None:
        dim = len(joined.select(emb_col).first()[0])
    sums = joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(F.col(emb_col)[i].cast("double")).alias(f"_s{i}")
          for i in range(dim)])
    rows = sums.collect()
    return [(int(r["cluster"]), [float(r[f"_s{i}"]) / r["_n"]
                                 for i in range(dim)])
            for r in rows]


def kmeans_fit_assign(corpus: DataFrame, k: int = 8, iters: int = 1,
                      id_col: str = "vec_id",
                      emb_col: str = "embedding") -> DataFrame:
    """Seed, run ``iters`` Lloyd update iterations, return the final
    assignment (id, cluster, dist).  Each iteration costs one map pass +
    one (cluster, pos)-keyed shuffle; cache ``corpus`` upstream when
    iterating more than a couple of times."""
    cents = seed_centroids(corpus, k, id_col, emb_col)
    dim = len(cents[0][1]) if cents else None
    for _ in range(iters):
        assigned = assign_clusters(corpus, cents, id_col, emb_col,
                                   keep_emb=True)
        cents = update_centroids(corpus, assigned, id_col, emb_col, dim=dim)
    return assign_clusters(corpus, cents, id_col, emb_col)


def pq_fit_assign(corpus: DataFrame, m: int = 4, k: int = 4,
                  iters: int = 1, id_col: str = "vec_id",
                  emb_col: str = "embedding") -> DataFrame:
    """Product quantization: split the d-dim embedding into ``m``
    contiguous subspaces and run an independent k-means (same Lloyd
    machinery as above) in each, returning one row per (vector,
    subspace) with its assigned code and quantization error.

    PQ is the storage-side half of large-scale ANN (IVF-PQ): m codes of
    log2(k) bits replace d floats per vector.  Scale shape: each
    subspace's assign pass is map-only over a sliced array (no shuffle),
    each update shuffles (code, pos) scalar partials; the m subspace
    plans are independent — they union without any cross-subspace
    exchange, and the codebooks (m x k x d/m doubles) stay driver-sized
    by construction."""
    d = corpus.select(F.size(F.col(emb_col)).alias("d")).first()["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by {m} subspaces")
    w = d // m
    outs = []
    for s in range(m):
        sub = corpus.select(
            F.col(id_col),
            F.slice(F.col(emb_col), s * w + 1, w).alias("_sub"))
        cents = seed_centroids(sub, k, id_col, "_sub")
        for _ in range(iters):
            assigned = assign_clusters(sub, cents, id_col, "_sub",
                                       keep_emb=True)
            cents = update_centroids(sub, assigned, id_col, "_sub", dim=w)
        outs.append(assign_clusters(sub, cents, id_col, "_sub")
                    .select(id_col, F.lit(s).alias("subspace"),
                            F.col("cluster").alias("code"),
                            F.col("dist").alias("qerr")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
