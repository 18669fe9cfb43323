"""Profiling / selection battery (q209+): substring-level dedup
audit, integer-exact k-means, blocked entity resolution, numeric
profiling, referential-integrity audit, weighted systematic sampling,
and exact distributed selection — the data-quality / curation
operations the earlier batteries did not yet cover.

Same det-hash discipline as the rest of the repo: every driver-hashed
value is integer-exact (md5-derived hashes, pmod floor division,
integer cross-multiplication), so DuckDB replays each pipeline
bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .operators.det_hash import md5_long, quantized_embedding
from .operators.text import tokens
from .queries import query, t

# =====================================================================
# q209 — duplicate n-gram span coverage (substring-level dedup audit)
# =====================================================================

_SPAN_N = 5  # n-gram width (words)


@query(
    "q209_dup_span_coverage",
    f"""
    WITH tk AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
      FROM documents
    ),
    base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, toks FROM tk),
    occ AS (
      SELECT doc_id, CAST(i + 1 AS BIGINT) AS s,
             CAST('0x' || substr(md5(array_to_string(
               toks[(CAST(i AS INT) + 1):(CAST(i AS INT) + {_SPAN_N})], ' ')), 1, 15) AS BIGINT) AS h
      FROM base, unnest(range(len(toks) - {_SPAN_N - 1})) AS u(i)
    ),
    dup AS (SELECT h FROM occ GROUP BY h HAVING count(*) >= 2),
    docc AS (SELECT occ.doc_id, occ.s FROM occ JOIN dup ON occ.h = dup.h),
    cov AS (
      SELECT DISTINCT doc_id, s + j AS p
      FROM docc, unnest(range({_SPAN_N})) AS v(j)
    ),
    perdoc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS covered_tokens FROM cov GROUP BY doc_id),
    ndup AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_occurrences FROM docc GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           COALESCE(n.dup_occurrences, 0) AS dup_occurrences,
           COALESCE(p.covered_tokens, 0) AS covered_tokens,
           CAST((1000 * COALESCE(p.covered_tokens, 0)) // b.n_tokens AS BIGINT) AS coverage_permille
    FROM base b
    LEFT JOIN perdoc p ON p.doc_id = b.doc_id
    LEFT JOIN ndup n ON n.doc_id = b.doc_id
    ORDER BY coverage_permille DESC, b.doc_id LIMIT 50
    """,
)
def q209(spark, sf_dir):
    """Substring-level duplicate-span audit (Lee et al. 2022,
    'Deduplicating Training Data Makes Language Models Better'): mark
    every 5-word n-gram that occurs >= 2 times ANYWHERE in the
    corpus (cross-doc or within-doc), then measure per document how
    many token positions fall inside at least one duplicated span —
    the signal substring dedup uses to clip repeated boilerplate that
    document-level dedup (q33/q34) cannot see.

    100 TB shape: n-gram occurrences reduce to 60-bit md5 hashes
    BEFORE any shuffle (strings never leave the map side — SCALE.md
    §7), the >=2 filter is one hash-agg with map-side combine, the
    join back is int-keyed, and span coverage is a bounded explode
    (x5) + per-doc distinct. No pairwise anything; output is a
    TakeOrdered top-50."""
    n = _SPAN_N
    docs = t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", tokens("text").alias("toks")
    ).select("doc_id", "toks", F.size("toks").cast("long").alias("n_tokens"))
    occ = (
        base.filter(F.col("n_tokens") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), (F.col("n_tokens") - F.lit(n - 1)).cast("int"))).alias("s"),
            "toks",
        )
        .select(
            "doc_id",
            F.col("s").cast("long").alias("s"),
            md5_long(F.concat_ws(" ", F.slice("toks", F.col("s"), n))).alias("h"),
        )
    )
    dup = occ.groupBy("h").agg(F.count(F.lit(1)).alias("occ_n")).filter(F.col("occ_n") >= 2).select("h")
    docc = occ.join(dup, "h").select("doc_id", "s")
    cov = docc.select(
        "doc_id", F.explode(F.sequence(F.col("s"), F.col("s") + F.lit(n - 1))).alias("p")
    ).distinct()
    perdoc = cov.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("covered_tokens"))
    ndup = docc.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("dup_occurrences"))
    out = (
        base.select("doc_id", "n_tokens")
        .join(perdoc, "doc_id", "left")
        .join(ndup, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_occurrences"), F.lit(0)).cast("long").alias("dup_occurrences"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
        )
        .withColumn(
            "coverage_permille",
            F.expr("CAST((1000 * covered_tokens) DIV n_tokens AS BIGINT)"),
        )
    )
    return out.orderBy(F.desc("coverage_permille"), "doc_id").limit(50)


# =====================================================================
# q210 — Lloyd k-means, 2 deterministic integer-exact iterations
# =====================================================================

_KM_K = 8


def _km_oracle_sql(k: int) -> str:
    """Chained-CTE replay of the Lloyd loop: deterministic seed pick
    (k smallest md5(vec_id) hashes), then two rounds of integer
    squared-L2 assignment + pmod-floor-division centroid recompute —
    the exact formulas the Spark side uses, so every assignment and
    every centroid coordinate matches bit-for-bit."""
    dist = "sum((ep.v - c.c) * (ep.v - c.c))"
    assign = """
    d{i}_ AS (
      SELECT ep.vec_id, c.cluster, {dist} AS dist
      FROM ep JOIN cent{j} c ON ep.d = c.d
      GROUP BY ep.vec_id, c.cluster
    ),
    m{i}_ AS (SELECT vec_id, min(dist) AS md FROM d{i}_ GROUP BY vec_id),
    a{i}_ AS (
      SELECT d.vec_id, min(d.cluster) AS cluster, min(d.dist) AS dist
      FROM d{i}_ d JOIN m{i}_ m ON m.vec_id = d.vec_id AND d.dist = m.md
      GROUP BY d.vec_id
    )"""
    recompute = """
    cent{i} AS (
      SELECT a.cluster, ep.d,
             CAST((sum(ep.v) - ((sum(ep.v) % count(*) + count(*)) % count(*))) // count(*) AS BIGINT) AS c
      FROM a{i}_ a JOIN ep ON ep.vec_id = a.vec_id
      GROUP BY a.cluster, ep.d
    )"""
    return f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    ep AS (
      SELECT vec_id, CAST(i AS INT) AS d, ei[CAST(i AS INT)] AS v
      FROM e, unnest(range(1, 65)) AS u(i)
    ),
    seed AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY h, vec_id) - 1 AS BIGINT) AS cluster
      FROM (
        SELECT vec_id, CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        FROM embeddings ORDER BY h, vec_id LIMIT {k}
      )
    ),
    cent0 AS (
      SELECT s.cluster, ep.d, ep.v AS c FROM seed s JOIN ep ON ep.vec_id = s.vec_id
    ),
    {assign.format(i=1, j=0, dist=dist)},
    {recompute.format(i=1)},
    {assign.format(i=2, j=1, dist=dist)}
    SELECT a.cluster,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(a.dist) AS BIGINT) AS inertia,
           CAST(sum(a.dist * a.vec_id) % 1000000007 AS BIGINT) AS assign_checksum
    FROM a2_ a
    GROUP BY a.cluster
    ORDER BY a.cluster
    """


@query("q210_kmeans_lloyd", _km_oracle_sql(_KM_K))
def q210(spark, sf_dir):
    """Lloyd k-means over the embeddings table, 2 deterministic
    iterations, everything integer-exact: micro-quantized vectors
    (round(x*1e6), as q167), squared-L2 distances in bigint, TRUE
    floor-mean centroids via (sum - pmod) DIV n, argmin with
    (dist, cluster) min-min tie-break. Seeds are the K=8 vectors
    with the smallest md5(vec_id) — a deterministic stand-in for
    random init that both engines compute identically. This is the
    quantizer-training step behind the IVF index (q66) and SemDeDup
    (q197), here as a first-class operator with the loop itself
    replayed by the oracle (chained CTEs, as q202's BPE training).

    100 TB shape per iteration: centroids are K x 64 rows — a
    broadcast; assignment is a linear explode-join-agg (shuffles keyed
    on vec_id ints); recompute is one hash-agg. Cost is
    O(N * dim * K) map-side work per iteration, no pairwise vector
    joins. A cluster left empty by a seed tie drops out (inner-join
    semantics) — deterministic on both engines."""
    emb = t(spark, sf_dir, "embeddings")
    ep = emb.select(
        "vec_id", F.posexplode(quantized_embedding("embedding")).alias("d0", "v")
    ).select("vec_id", (F.col("d0") + 1).cast("int").alias("d"), "v")
    seed = (
        emb.select("vec_id", md5_long(F.col("vec_id").cast("string")).alias("h"))
        .orderBy("h", "vec_id")
        .limit(_KM_K)
    )
    from pyspark.sql import Window

    w = Window.orderBy("h", "vec_id")  # K rows post-limit: single tiny partition
    seed = seed.select("vec_id", (F.row_number().over(w) - 1).cast("long").alias("cluster"))
    cent = seed.join(ep, "vec_id").select("cluster", "d", F.col("v").alias("c"))

    def assign(cent_df):
        dist = (
            ep.join(F.broadcast(cent_df), "d")
            .groupBy("vec_id", "cluster")
            .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist"))
        )
        md = dist.groupBy("vec_id").agg(F.min("dist").alias("md"))
        return (
            dist.join(md, "vec_id")
            .filter(F.col("dist") == F.col("md"))
            .groupBy("vec_id")
            .agg(F.min("cluster").alias("cluster"), F.min("dist").alias("dist"))
        )

    def recompute(a_df):
        return (
            a_df.select("vec_id", "cluster")
            .join(ep, "vec_id")
            .groupBy("cluster", "d")
            .agg(F.expr("CAST((sum(v) - pmod(sum(v), count(*))) DIV count(*) AS BIGINT)").alias("c"))
        )

    a1 = assign(cent)
    cent1 = recompute(a1)
    a2 = assign(cent1)
    return (
        a2.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("dist").cast("long").alias("inertia"),
            (F.sum(F.col("dist") * F.col("vec_id")) % F.lit(1000000007)).cast("long").alias("assign_checksum"),
        )
        .orderBy("cluster")
    )
