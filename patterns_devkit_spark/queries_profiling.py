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


# =====================================================================
# q211 — blocked entity resolution (near-match part names)
# =====================================================================

_ER_MAXLEV = 4


@query(
    "q211_entity_resolution",
    f"""
    WITH names AS (
      SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY p_name
    ),
    blocked AS (SELECT name, n_parts, substr(name, 1, 1) AS blk FROM names),
    pairs AS (
      SELECT a.name AS name_a, b.name AS name_b,
             CAST(levenshtein(a.name, b.name) AS BIGINT) AS lev,
             a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
             a.n_parts * b.n_parts AS pair_weight
      FROM blocked a JOIN blocked b
        ON a.blk = b.blk AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= {_ER_MAXLEV}
    )
    SELECT name_a, name_b, lev, n_parts_a, n_parts_b, pair_weight
    FROM pairs
    ORDER BY lev, name_a, name_b LIMIT 50
    """,
)
def q211(spark, sf_dir):
    """Blocked entity resolution over part names: candidate pairs are
    generated only WITHIN a blocking key (first character), scored
    with Levenshtein, and kept under an edit-distance threshold — the
    classic record-linkage shape (block -> compare -> match). The
    pairwise stage runs on DISTINCT name values and multiplies match
    weight by multiplicity afterwards (the q90 trick: heavily
    duplicated value domains must never be compared row-by-row).

    100 TB shape: the distinct-values aggregation collapses the
    pairwise domain from row count to value-domain count; blocking
    bounds candidates to sum(block_size^2) instead of N^2 — with a
    real phonetic/sorted-neighborhood key the block histogram is the
    tuning dial (q175 reports it). The block equi-join shuffles on a
    1-char key here; a production key (soundex / prefix+length) has
    the same plan with more blocks."""
    names = t(spark, sf_dir, "part").groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts")
    )
    blocked = names.select("name", "n_parts", F.substring("name", 1, 1).alias("blk"))
    a = blocked.alias("a")
    b = blocked.alias("b")
    pairs = (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.name") < F.col("b.name")))
        .withColumn("lev", F.levenshtein(F.col("a.name"), F.col("b.name")).cast("long"))
        .filter(F.col("lev") <= _ER_MAXLEV)
        .select(
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            "lev",
            F.col("a.n_parts").alias("n_parts_a"),
            F.col("b.n_parts").alias("n_parts_b"),
            (F.col("a.n_parts") * F.col("b.n_parts")).alias("pair_weight"),
        )
    )
    return pairs.orderBy("lev", "name_a", "name_b").limit(50)


# =====================================================================
# q212 — numeric profile: exact equal-width histograms, 16 bins
# =====================================================================

_HIST_B = 16


@query(
    "q212_numeric_histogram",
    f"""
    WITH vals AS (
      SELECT 'l_extendedprice' AS col_name, CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
      UNION ALL
      SELECT 'l_quantity' AS col_name, CAST(round(l_quantity * 100) AS BIGINT) AS v FROM lineitem
      UNION ALL
      SELECT 'o_totalprice' AS col_name, CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders
    ),
    rng AS (
      SELECT col_name, min(v) AS vmin, max(v) AS vmax,
             max(v) - min(v) + 1 AS w
      FROM vals GROUP BY col_name
    ),
    binned AS (
      SELECT v.col_name,
             CAST(least({_HIST_B - 1}, ((v.v - r.vmin) * {_HIST_B}) // r.w) AS BIGINT) AS bin,
             r.vmin, r.w
      FROM vals v JOIN rng r ON v.col_name = r.col_name
    )
    SELECT col_name, bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(vmin + (bin * w) // {_HIST_B} AS BIGINT) AS bin_lo_cents
    FROM binned
    GROUP BY col_name, bin, vmin, w
    ORDER BY col_name, bin
    """,
)
def q212(spark, sf_dir):
    """Numeric data profiling: exact equal-width histograms (16 bins)
    over three money/quantity columns at once, integer-exact in cents
    (bin index and bin floor computed with bigint floor division on
    both engines — no float binning drift). The per-column min/max
    CTE and the bin aggregation give profile-grade output: bin
    occupancy exposes skew, outliers, and constant columns before a
    pipeline trains or joins on the data.

    100 TB shape: pass 1 computes per-column min/max (map-side
    combine, 3-row result broadcast back), pass 2 is one scan with a
    bounded key domain (3 cols x 16 bins) hash-agg — two narrow scans
    total, no sort, no window. The unpivot is a UNION of column
    projections, so parquet reads only the three profiled columns."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    vals = (
        li.select(F.lit("l_extendedprice").alias("col_name"), F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"))
        .unionAll(li.select(F.lit("l_quantity").alias("col_name"), F.round(F.col("l_quantity") * 100).cast("long").alias("v")))
        .unionAll(orders.select(F.lit("o_totalprice").alias("col_name"), F.round(F.col("o_totalprice") * 100).cast("long").alias("v")))
    )
    rng = vals.groupBy("col_name").agg(
        F.min("v").alias("vmin"), F.max("v").alias("vmax"), (F.max("v") - F.min("v") + 1).alias("w")
    )
    binned = vals.join(F.broadcast(rng), "col_name").select(
        "col_name",
        F.least(F.lit(_HIST_B - 1), F.expr(f"((v - vmin) * {_HIST_B}) DIV w")).cast("long").alias("bin"),
        "vmin",
        "w",
    )
    return (
        binned.groupBy("col_name", "bin", "vmin", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(
            "col_name", "bin", "n",
            F.expr(f"CAST(vmin + (bin * w) DIV {_HIST_B} AS BIGINT)").alias("bin_lo_cents"),
        )
        .orderBy("col_name", "bin")
    )


# =====================================================================
# q213 — referential-integrity audit (every FK edge, orphan counts)
# =====================================================================

_FK_EDGES = [
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def _fk_oracle_sql() -> str:
    parts = []
    for edge, child, ck, parent, pk in _FK_EDGES:
        parts.append(f"""
    SELECT '{edge}' AS edge,
           (SELECT CAST(count(*) AS BIGINT) FROM {child}) AS child_rows,
           CAST(count(*) AS BIGINT) AS orphan_rows,
           CAST(count(DISTINCT c.{ck}) AS BIGINT) AS orphan_keys
    FROM {child} c
    WHERE c.{ck} IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{ck})""")
    return " UNION ALL ".join(parts) + " ORDER BY edge"


@query("q213_fk_integrity_audit", _fk_oracle_sql())
def q213(spark, sf_dir):
    """Referential-integrity audit across every foreign-key edge of
    the schema in one result: per edge, total child rows, orphan rows
    (non-null FK with no parent), and distinct orphan key values —
    the dbt-style 'relationships' test generalized to the whole
    schema, run before any pipeline trusts its joins (the
    events->customer edge is EXPECTED to surface orphans in synthetic
    data; the audit quantifies rather than assumes).

    100 TB shape: each edge is one anti-join aggregated to a single
    row — dims broadcast, the two fact-fact edges shuffle on integer
    keys only (child key column + parent key column, nothing wider),
    and the 8 one-row results union into a seekable report. Orphan
    KEY cardinality uses count(distinct) per edge over an
    already-tiny orphan set."""
    dfs = {name: t(spark, sf_dir, name) for name in
           {"lineitem", "orders", "part", "supplier", "customer", "nation", "region", "events"}}
    out = None
    for edge, child, ck, parent, pk in _FK_EDGES:
        c = dfs[child]
        p = dfs[parent].select(F.col(pk).alias(ck)).distinct()
        child_rows = c.count()
        orphans = c.select(ck).filter(F.col(ck).isNotNull()).join(p, ck, "left_anti")
        row = orphans.agg(
            F.lit(edge).alias("edge"),
            F.lit(child_rows).cast("long").alias("child_rows"),
            F.count(F.lit(1)).cast("long").alias("orphan_rows"),
            F.countDistinct(ck).cast("long").alias("orphan_keys"),
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("edge")


# =====================================================================
# q214 — systematic PPS sampling (weighted, deterministic, exact)
# =====================================================================

_PPS_TARGET = 1000  # target number of draws


@query(
    "q214_systematic_pps_sample",
    f"""
    WITH w AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS wt,
             CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT) AS hkey
      FROM orders
    ),
    c AS (
      SELECT o_orderkey, o_orderpriority, wt,
             sum(wt) OVER (ORDER BY hkey, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(wt) OVER () AS total
      FROM w
    ),
    sel AS (
      SELECT o_orderkey, o_orderpriority, wt,
             (cum // greatest(1, total // {_PPS_TARGET}))
               - ((cum - wt) // greatest(1, total // {_PPS_TARGET})) AS sel_n
      FROM c
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN sel_n >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
           CAST(sum(sel_n) AS BIGINT) AS n_draws,
           CAST(sum(CASE WHEN sel_n >= 1 THEN wt ELSE 0 END) AS BIGINT) AS w_selected,
           CAST(sum(o_orderkey * sel_n) % 1000000007 AS BIGINT) AS sel_checksum
    FROM sel
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q214(spark, sf_dir):
    """Deterministic systematic PPS (probability-proportional-to-size)
    sampling: order rows by a hash of their key (a deterministic
    stand-in for a random permutation), take the exact prefix sum of
    integer weights, and select every row whose weight interval
    crosses a stride boundary (stride = total/target). A row heavier
    than the stride is drawn multiple times (sel_n > 1) — the
    textbook systematic-PPS estimator, fully reproducible: no RNG,
    the same rows are drawn on every engine and every retry.

    100 TB shape: the prefix sum is the two-pass range-partitioned
    operator (operators/windows.global_prefix_sum — bucket-local
    running sums plus broadcast per-bucket offsets), NOT a
    single-partition window; the stride scalar comes from a 1-row
    aggregate broadcast into the scan. Everything else is one
    hash-agg at priority grain. The oracle computes the identical
    prefix sum with a plain window (single-node DuckDB can)."""
    from .operators.windows import global_prefix_sum

    w = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("wt"),
        md5_long(F.col("o_orderkey").cast("string")).alias("hkey"),
    )
    c = global_prefix_sum(
        w, "hkey", True, [F.col("hkey"), F.col("o_orderkey")], "wt", out_col="cum"
    )
    total_df = w.agg(F.sum("wt").cast("long").alias("total"))
    sel = (
        c.crossJoin(F.broadcast(total_df))
        .withColumn("stride", F.expr(f"greatest(CAST(1 AS BIGINT), total DIV {_PPS_TARGET})"))
        .withColumn("sel_n", F.expr("cum DIV stride - (cum - wt) DIV stride"))
    )
    return (
        sel.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("sel_n") >= 1, 1).otherwise(0)).cast("long").alias("n_selected"),
            F.sum("sel_n").cast("long").alias("n_draws"),
            F.sum(F.when(F.col("sel_n") >= 1, F.col("wt")).otherwise(0)).cast("long").alias("w_selected"),
            (F.sum(F.col("o_orderkey") * F.col("sel_n")) % F.lit(1000000007)).cast("long").alias("sel_checksum"),
        )
        .orderBy("o_orderpriority")
    )


# =====================================================================
# q215 — exact distributed quantile selection (no global sort)
# =====================================================================

_SEL_B = 4096  # histogram buckets for the narrowing pass


@query(
    "q215_exact_quantile_select",
    f"""
    WITH vals AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
    ),
    meta AS (SELECT CAST(count(*) AS BIGINT) AS n FROM vals),
    ks AS (
      SELECT q.qname, q.pct, ((meta.n - 1) * q.pct) // 100 + 1 AS k, meta.n
      FROM (SELECT 'p50' AS qname, 50 AS pct UNION ALL SELECT 'p90', 90) q, meta
    ),
    ordered AS (SELECT v, row_number() OVER (ORDER BY v) AS rn FROM vals)
    SELECT ks.qname, ks.n, ks.k, o.v AS value_cents
    FROM ks JOIN ordered o ON o.rn = ks.k
    ORDER BY ks.qname
    """,
)
def q215(spark, sf_dir):
    """Exact global quantiles (p50/p90) by two-pass histogram
    narrowing — the distributed selection algorithm: pass 1 bins the
    value domain into 4096 equal-width integer buckets and finds the
    bucket containing the k-th order statistic from the (bounded,
    4096-row) cumulative bucket counts; pass 2 rescans ONLY that
    bucket's values and finds the k-th value by per-value counting.
    No global sort, no approx_percentile — the answer is the exact
    order statistic, and the ORACLE verifies it with a genuinely
    different algorithm (full sort + row_number() = k), making this
    an independent cross-check rather than a replay.

    100 TB shape: two narrow column scans with map-side combine; the
    only windows run over bounded 4096-row (bucket) and
    bucket-local distinct-value frames — never over row-grain data.
    Generalizes to any k (trimmed means, exact IQR fences) at the
    same cost."""
    from pyspark.sql import Window

    vals = t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v")
    )
    meta = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("vmin"),
        (F.max("v") - F.min("v") + 1).alias("w"),
    )
    qs = spark.createDataFrame([("p50", 50), ("p90", 90)], "qname string, pct int")
    ks = qs.crossJoin(F.broadcast(meta)).select(
        "qname", "n", "vmin", "w", F.expr("((n - 1) * pct) DIV 100 + 1").alias("k")
    )
    binned = vals.crossJoin(F.broadcast(meta.select("vmin", "w"))).select(
        "v", F.expr(f"least(CAST({_SEL_B - 1} AS BIGINT), ((v - vmin) * {_SEL_B}) DIV w)").alias("bin")
    )
    bins = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.orderBy("bin")  # bounded: <= 4096 rows
    bins_c = bins.withColumn("cum", F.sum("cnt").over(wb)).withColumn(
        "cum_prev", F.col("cum") - F.col("cnt")
    )
    cand = (
        ks.join(F.broadcast(bins_c), (F.col("cum") >= F.col("k")) & (F.col("cum_prev") < F.col("k")))
        .select("qname", "n", "k", "bin", "cum_prev")
    )
    in_bin = binned.join(
        F.broadcast(cand.select("qname", "k", "bin", "cum_prev")), "bin"
    )
    perv = in_bin.groupBy("qname", "k", "cum_prev", "v").agg(F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("qname").orderBy("v")  # bucket-local: bounded by bin occupancy
    hit = (
        perv.withColumn("cumv", F.sum("c").over(wv) + F.col("cum_prev"))
        .filter(F.col("cumv") >= F.col("k"))
        .groupBy("qname", "k")
        .agg(F.min("v").alias("value_cents"))
    )
    return (
        hit.join(ks.select("qname", "n"), "qname")
        .select("qname", "n", "k", "value_cents")
        .orderBy("qname")
    )
