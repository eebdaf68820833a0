"""Similarity search over embedding columns (array<float>).

- `cosine_topk`: brute-force exact top-k, pure JVM column expressions
  (zip_with dot product) — the correctness baseline, embarrassingly parallel
  (map + TakeOrdered k; no shuffle of the embedding table).
- `cosine_topk_arrow`: the same math through a vectorized Arrow UDF using a
  single numpy matrix-vector product per batch — the throughput path.
- `lsh_ann_topk`: random-hyperplane LSH bucketing: 100 TB path — candidates
  share the query's sign-bucket (optionally within hamming radius 1), exact
  cosine re-rank inside the bucket.

Hyperplanes are generated from a deterministic seed so results are stable
and oracle-checkable.
"""

from __future__ import annotations

import math
import random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _lit_array(vec) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_similarity_col(emb_col, query_vec) -> F.Column:
    q = _lit_array(query_vec)
    qn = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    e = F.transform(emb_col, lambda x: x.cast("double"))
    return _dot(e, q) / (_norm(e) * F.lit(qn))


def cosine_topk(df: DataFrame, query_vec, k: int = 10,
                emb_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cosine) exact top-k; deterministic ties by id."""
    return (df.select(F.col(id_col),
                      cosine_similarity_col(F.col(emb_col), query_vec)
                      .alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def cosine_topk_arrow(df: DataFrame, query_vec, k: int = 10,
                      emb_col: str = "embedding",
                      id_col: str = "vec_id") -> DataFrame:
    """Same ranking via a numpy-vectorized Arrow UDF (one BLAS matvec per
    Arrow batch instead of per-element codegen)."""
    import numpy as np

    q = np.asarray(list(map(float, query_vec)))
    qn = float(np.linalg.norm(q))

    @F.pandas_udf(DoubleType())
    def cos(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy())
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
        return pd.Series(sims)

    return (df.select(F.col(id_col), cos(F.col(emb_col)).alias("cosine"))
            .orderBy(F.desc("cosine"), F.asc(id_col))
            .limit(k))


def random_hyperplanes(dim: int, n_planes: int = 8, seed: int = 42):
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_col(emb_col, planes) -> F.Column:
    """Sign-bit bucket id from deterministic hyperplanes."""
    e = F.transform(emb_col, lambda x: x.cast("double"))
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        bit = F.when(_dot(e, _lit_array(plane)) >= 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def query_probes(query_vec, planes, multiprobe: bool = True) -> list[int]:
    """The query's sign bucket plus (multiprobe) every hamming-1 neighbor —
    computed driver-side so a persisted index scan prunes to these bucket
    directories with zero Spark jobs."""
    qbits = 0
    for i, plane in enumerate(planes):
        if sum(p * float(x) for p, x in zip(plane, query_vec)) >= 0:
            qbits |= 1 << i
    return [qbits] + ([qbits ^ (1 << i) for i in range(len(planes))]
                      if multiprobe else [])


def lsh_ann_topk(df: DataFrame, query_vec, k: int = 10, n_planes: int = 8,
                 seed: int = 42, emb_col: str = "embedding",
                 id_col: str = "vec_id", multiprobe: bool = True) -> DataFrame:
    """Approximate top-k: candidates from the query's LSH bucket (plus all
    hamming-1 buckets when multiprobe), exact cosine within.

    Recomputes hyperplane dots over every vector per query — fine ad-hoc,
    wrong at scale: persist with `build_ann_index` and probe with
    `ann_query` instead."""
    planes = random_hyperplanes(len(query_vec), n_planes, seed)
    probes = query_probes(query_vec, planes, multiprobe)
    bucketed = df.withColumn("_bucket", lsh_bucket_col(F.col(emb_col), planes))
    cands = bucketed.where(F.col("_bucket").isin(probes))
    return cosine_topk(cands, query_vec, k, emb_col, id_col)


def lsh_bucket_arrow(planes):
    """Arrow-vectorized sign-bucket kernel: one numpy matmul per batch
    instead of n_planes nested fold expressions (the codegen of which
    dominates at build time). Sign margins on real embeddings are orders of
    magnitude above float-summation noise, so this agrees with
    `lsh_bucket_col` and the inlined-literal SQL oracle."""
    import numpy as np
    from pyspark.sql.types import IntegerType

    pm = np.asarray(planes, dtype=np.float64).T  # (dim, n_planes)
    weights = (1 << np.arange(pm.shape[1])).astype(np.int64)

    @F.pandas_udf(IntegerType())
    def bucket(emb: pd.Series) -> pd.Series:
        mat = np.vstack(emb.to_numpy()).astype(np.float64)
        bits = (mat @ pm) >= 0
        return pd.Series((bits @ weights).astype(np.int32))

    return bucket


def build_ann_index(df: DataFrame, out_dir: str, n_planes: int = 8,
                    seed: int = 42, emb_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """Persist the LSH-bucketed embedding table, directory-partitioned by
    bucket: the scale path for ANN. One pass computes every vector's
    sign-bucket; queries then read only the probed bucket directories
    (parquet partition pruning from driver-side literals) instead of
    re-hashing the whole table per query. Plane metadata (n_planes, seed,
    dim) rides a tiny side table so queries regenerate identical planes."""
    spark = df.sparkSession
    dim = len(df.select(emb_col).first()[0])
    planes = random_hyperplanes(dim, n_planes, seed)
    (df.withColumn("bucket", lsh_bucket_arrow(planes)(F.col(emb_col)))
       .write.mode("overwrite").partitionBy("bucket")
       .parquet(f"{out_dir}/vectors"))
    spark.createDataFrame([(n_planes, seed, dim)],
                          "n_planes int, seed int, dim int") \
        .write.mode("overwrite").parquet(f"{out_dir}/meta")


class AnnIndex:
    """Loaded handle over a persisted ANN index: plane metadata is read
    ONCE, so each query is a single bucket-pruned scan action."""

    def __init__(self, vectors: DataFrame, planes):
        self.vectors = vectors
        self.planes = planes

    def candidates(self, query_vec, multiprobe: bool = True) -> DataFrame:
        probes = query_probes(query_vec, self.planes, multiprobe)
        return self.vectors.where(F.col("bucket").isin(probes))

    def query(self, query_vec, k: int = 10, emb_col: str = "embedding",
              id_col: str = "vec_id", multiprobe: bool = True) -> DataFrame:
        return cosine_topk_arrow(self.candidates(query_vec, multiprobe),
                                 query_vec, k, emb_col, id_col)


def load_ann_index(spark, out_dir: str) -> AnnIndex:
    meta = spark.read.parquet(f"{out_dir}/meta").first()
    planes = random_hyperplanes(int(meta["dim"]), int(meta["n_planes"]),
                                int(meta["seed"]))
    return AnnIndex(spark.read.parquet(f"{out_dir}/vectors"), planes)


def ann_candidates(spark, out_dir: str, query_vec,
                   multiprobe: bool = True) -> DataFrame:
    """Probe a persisted ANN index: rows whose bucket is the query's sign
    bucket or (multiprobe) a hamming-1 neighbor. Probes are driver-side
    literals → the scan prunes to ≤ n_planes+1 bucket directories.
    (One-shot form; load_ann_index amortizes the metadata read.)"""
    return load_ann_index(spark, out_dir).candidates(query_vec, multiprobe)


def ann_query(spark, out_dir: str, query_vec, k: int = 10,
              emb_col: str = "embedding", id_col: str = "vec_id",
              multiprobe: bool = True) -> DataFrame:
    """(vec_id, cosine) top-k over a persisted ANN index: bucket-pruned
    candidate scan, exact cosine re-rank within (Arrow matvec — the
    nested-fold column expression costs ~1 s of codegen per query)."""
    cands = ann_candidates(spark, out_dir, query_vec, multiprobe)
    return cosine_topk_arrow(cands, query_vec, k, emb_col, id_col)
