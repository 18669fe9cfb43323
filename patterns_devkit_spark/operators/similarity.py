"""Similarity search over embedding columns (array<float>).

Two paths, as a 100 TB engine needs both:
- cosine_topk: exact brute force — each query vector scans all
  candidates. Distributed as broadcast(queries) × candidates, so the
  big side streams once with no shuffle; dot products run as JVM
  higher-order functions (zip_with + aggregate), no Python in the loop.
  O(Q×N) work: the right tool when Q is small, and the correctness
  baseline for the approximate path.
- ann_lsh: BucketedRandomProjectionLSH (random-hyperplane buckets);
  candidates come from bucket equi-joins — sublinear per query at the
  cost of recall. Approximate -> rows-only driver check.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: str | Column, b: str | Column) -> Column:
    """Dot product of two array<double> columns, JVM-side."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str) -> DataFrame:
    """Adds __vec (array<double>) and __norm columns. Floats are cast to
    double BEFORE any arithmetic so accumulation error stays at double
    precision (and matches the DuckDB oracle)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = df.withColumn("__vec", v)
    return df.withColumn("__norm", F.sqrt(dot("__vec", "__vec")))


def cosine(va: str, vb: str, na: str, nb: str) -> Column:
    return dot(va, vb) / (F.col(na) * F.col(nb))


def cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) nested-loop with the candidate scan
    (one pass over the big side, map-side only), then a per-query top-k
    window. Ties broken by neighbor id for determinism.
    """
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("__vec").alias("qv"), F.col("__norm").alias("qn")
    )
    c = with_norm(candidates, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("__vec").alias("cv"), F.col("__norm").alias("cn")
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select("query_id", "neighbor_id", cosine("qv", "cv", "qn", "cn").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def cosine_topk_np(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine via Arrow-batched numpy: the query matrix is
    broadcast to every executor; each candidate batch does ONE
    matrix-matrix product (BLAS) and a partial top-k, then a final
    per-query top-k merges partials. This is the throughput path at
    scale — per-batch work is a GEMM instead of per-row interpreted
    expression evaluation; network cost is only Q×k rows per partition.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    spark = candidates.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    qmat = np.array([r[vec_col] for r in qrows], dtype=np.float64)
    qmat = qmat / np.linalg.norm(qmat, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((qids, qmat))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def score(batches):
        ids_q, mat_q = bq.value
        for pdf in batches:
            cids = pdf[id_col].to_numpy(dtype=np.int64)
            cmat = np.stack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)
            sims = cmat @ mat_q.T  # (batch, Q)
            n = len(cids)
            kk = min(k + 1, n)  # +1 to survive self-match removal
            part = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # per query
            rows = []
            for j in range(sims.shape[1]):
                for i in part[:, j]:
                    if cids[i] != ids_q[j]:
                        rows.append((int(ids_q[j]), int(cids[i]), float(sims[i, j])))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partial = candidates.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", 6).alias("cosine"))
    )


def ann_lsh(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_tables: int = 4,
) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane bucketing
    (Spark ML BucketedRandomProjectionLSH). Bucket equi-join prunes the
    candidate set; exact distance only on collisions. The 100 TB path:
    shuffle is on (table, bucket) keys, never all-pairs."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    cand = candidates.select(F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features"))
    qry = queries.select(F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length, numHashTables=num_tables, seed=42
    )
    model = lsh.fit(cand)
    joined = model.approxSimilarityJoin(qry, cand, float("inf"), distCol="dist")
    pairs = joined.filter(F.col("datasetA.id") != F.col("datasetB.id")).select(
        F.col("datasetA.id").alias("query_id"),
        F.col("datasetB.id").alias("neighbor_id"),
        F.col("dist").alias("l2_dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2_dist").asc(), F.col("neighbor_id").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
