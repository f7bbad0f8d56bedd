"""Similarity search over embedding columns (array<float>).

- brute_force_topk: exact cosine top-k — the correctness baseline. Dot
  products stay JVM-side (zip_with + aggregate → whole-stage codegen);
  top-k compiles to TakeOrderedAndProject (distributed heap, no global sort).
- lsh_topk: random-hyperplane LSH bucketing — the 100 TB scale path: probe
  touches only matching buckets; recall measured against brute force in tests.
- cosine_neardup_pairs: embedding near-dup pairs within LSH buckets.

Hyperplanes are derived deterministically from a seed via md5 (no RNG at plan
time — reruns and resumed jobs see identical buckets).
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _unit(vec: list[float]) -> list[float]:
    n = math.sqrt(sum(x * x for x in vec)) or 1.0
    return [x / n for x in vec]


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from md5(seed, plane, chunk)."""
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        c = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}|{p}|{c}".encode()).digest()
            for i in range(0, 16, 4):
                u = int.from_bytes(h[i:i + 4], "big") / 2**32
                vals.append(u - 0.5)
            c += 1
        planes.append(_unit(vals[:dim]))
    return planes


def _dot(vec_col, lit_vec: list[float]):
    arr = F.array(*[F.lit(float(x)) for x in lit_vec])
    return F.aggregate(
        F.zip_with(vec_col.cast("array<double>"), arr, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col.cast("array<double>"),
                              F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_to_query(vec_col, query_vec: list[float]):
    """Cosine(vec, q) as a Column — all JVM higher-order functions.
    Op order matches DuckDB's list_cosine_similarity (dot / (|a|·|b|))."""
    qn = math.sqrt(sum(x * x for x in query_vec)) or 1.0
    return _dot(vec_col, query_vec) / (_norm(vec_col) * F.lit(qn))


def brute_force_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    """Exact cosine top-k: orderBy(desc).limit(k) →
    TakeOrderedAndProject — each partition keeps a k-heap, driver merges;
    no shuffle of the full table, no global sort."""
    scored = df.select(
        F.col(id_col),
        F.round(cosine_to_query(F.col(vec_col), query_vec), 6).alias("cosine"),
    )
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def add_lsh_buckets(df: DataFrame, dim: int, n_planes: int = 8,
                    seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Attach the random-hyperplane sign bucket (int 0..2^n_planes-1)."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        bucket = bucket + F.when(_dot(F.col(vec_col), p) >= 0,
                                 F.lit(1 << i)).otherwise(F.lit(0))
    return df.withColumn("lsh_bucket", bucket.cast("int"))


def lsh_topk(df_bucketed: DataFrame, query_vec: list[float], k: int = 10,
             dim: int | None = None, n_planes: int = 8, seed: int = 42,
             n_probe_hamming: int = 1, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """ANN top-k: score only rows in the query's bucket ± hamming-n_probe
    neighbors. At scale the bucket column is a partition key, so the probe is
    partition-pruned I/O, not a full scan. Approximate; recall vs brute force
    is measured in tests."""
    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qb |= 1 << i
    probe = {qb}
    if n_probe_hamming >= 1:
        probe |= {qb ^ (1 << i) for i in range(n_planes)}
    if n_probe_hamming >= 2:
        probe |= {qb ^ (1 << i) ^ (1 << j)
                  for i in range(n_planes) for j in range(i + 1, n_planes)}
    cand = df_bucketed.filter(F.col("lsh_bucket").isin(sorted(probe)))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def train_ivf_centroids(df: DataFrame, n_centroids: int = 16,
                        sample: int = 4096, iters: int = 10, seed: int = 42,
                        id_col: str = "vec_id", vec_col: str = "embedding"
                        ) -> list[list[float]]:
    """Spherical k-means coarse quantizer for IVF — trained driver-side on a
    DETERMINISTIC sample (rows ranked by xxhash64(id), so reruns/resumes see
    the identical sample regardless of partitioning). Centroids are tiny
    (n_centroids × dim floats) — training them on the driver is the standard
    IVF recipe; ASSIGNMENT (the 100 TB part) stays distributed
    (add_ivf_cells). Initialization = first n_centroids sampled rows (seeded
    by the same hash order); Lloyd iterations with cosine assignment."""
    import numpy as np

    rows = (df.select(vec_col)
            .orderBy(F.xxhash64(F.concat(F.col(id_col).cast("string"),
                                         F.lit(str(seed)))))
            .limit(sample).collect())
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(n_centroids):
            members = X[assign == c]
            if members.size:
                C[c] = members.sum(axis=0)
        C /= np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return [[float(x) for x in row] for row in C]


def add_ivf_cells(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding") -> DataFrame:
    """Attach the IVF cell id (nearest centroid by cosine) — one Arrow-batched
    matmul per batch, no per-row Python. At scale `ivf_cell` becomes the
    partition key of the vector table, so probes are partition-pruned I/O."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    C = np.array(centroids, dtype=np.float64)

    @pandas_udf(IntegerType())
    def _cell(vecs: pd.Series) -> pd.Series:
        X = np.array(list(vecs), dtype=np.float64)
        X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(X @ C.T, axis=1).astype(np.int32))

    return df.withColumn("ivf_cell", _cell(F.col(vec_col)))


def ivf_topk(df_cells: DataFrame, centroids: list[list[float]],
             query_vec: list[float], k: int = 10, n_probe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF ANN top-k: rank centroids by cosine to the query, scan only the
    n_probe nearest cells, exact re-rank inside them. Approximate — recall
    vs brute force is measured in tests; n_probe = n_centroids degenerates
    to exact search."""
    import numpy as np

    C = np.array(centroids, dtype=np.float64)
    q = np.array(query_vec, dtype=np.float64)
    q /= max(float(np.linalg.norm(q)), 1e-12)
    order = np.argsort(-(C @ q), kind="stable")
    cells = [int(c) for c in order[:n_probe]]
    cand = df_cells.filter(F.col("ivf_cell").isin(cells))
    return brute_force_topk(cand, query_vec, k, id_col, vec_col)


def cosine_neardup_pairs(df: DataFrame, block_col: str, threshold: float = 0.95,
                         id_col: str = "vec_id", vec_col: str = "embedding"
                         ) -> DataFrame:
    """Embedding near-dup pairs within blocks (LSH bucket or label): pairwise
    cosine ≥ threshold, id_a < id_b. The block join keeps this off all-pairs;
    dot products via zip_with stay in codegen."""
    v = df.select(F.col(id_col).alias("_id"),
                  F.col(vec_col).cast("array<double>").alias("_v"),
                  F.col(block_col).alias("_blk"))
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(F.zip_with("a._v", "b._v", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("a._v", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("b._v", F.lit(0.0), lambda acc, x: acc + x * x))
    return (a.join(b, F.col("a._blk") == F.col("b._blk"))
            .filter(F.col("a._id") < F.col("b._id"))
            .select(F.col("a._id").alias("id_a"),
                    F.col("b._id").alias("id_b"),
                    F.round(dot / (na * nb), 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))
