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
    # single-file fixture = 1 scan partition: spread docs before the
    # explode/hash work (CLAUDE.md trap; dedup.py does the same)
    base = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
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
    from pyspark.sql import Window

    # >=2 marking as a window over the occurrence hash: identical rows
    # to the old groupBy(h)-then-join-back form, but the explode+hash
    # subtree is evaluated ONCE and shuffles once on h (the agg+join
    # form evaluated it twice — r6 opt)
    w_h = Window.partitionBy("h")
    docc = (
        occ.withColumn("occ_n", F.count(F.lit(1)).over(w_h))
        .filter(F.col("occ_n") >= 2)
        .select("doc_id", "s")
    )
    # one aggregation computes BOTH per-doc measures: start positions s
    # are distinct within a doc by construction (one n-gram per
    # position), so countDistinct(s) == the old count of docc rows,
    # and countDistinct(p) == the old distinct-then-count coverage
    per = docc.select(
        "doc_id", "s", F.explode(F.sequence(F.col("s"), F.col("s") + F.lit(n - 1))).alias("p")
    ).groupBy("doc_id").agg(
        F.countDistinct("s").cast("long").alias("dup_occurrences"),
        F.countDistinct("p").cast("long").alias("covered_tokens"),
    )
    out = (
        base.select("doc_id", "n_tokens")
        .join(per, "doc_id", "left")
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
           CAST(sum(((a.dist % 1000000007) * (a.vec_id % 1000000007)) % 1000000007) % 1000000007 AS BIGINT) AS assign_checksum
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
    # cache the exploded points ONCE (eager fill): the seed join, both
    # assignment passes and the recompute all re-read them — without
    # the cache each consumer re-ran the scan+posexplode, and nested
    # iteration lineage multiplied that to 16 parquet scans in the
    # final plan (r6 opt). Caching the points is the canonical Lloyd
    # layout at any scale.
    ep = (
        emb.select("vec_id", F.posexplode(quantized_embedding("embedding")).alias("d0", "v"))
        .select("vec_id", (F.col("d0") + 1).cast("int").alias("d"), "v")
        .persist()
    )
    ep.count()
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
        # argmin as ONE aggregation: min(struct(dist, cluster)) =
        # smallest distance, ties to the smallest cluster — exactly the
        # old min + join-back + filter + min rule, which evaluated the
        # dist subtree twice per assignment (r6 opt, the q248 trick)
        return (
            dist.groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cluster")).alias("__best"))
            .select(
                "vec_id",
                F.col("__best.cluster").alias("cluster"),
                F.col("__best.dist").alias("dist"),
            )
        )

    def recompute(a_df):
        return (
            a_df.select("vec_id", "cluster")
            .join(ep, "vec_id")
            .groupBy("cluster", "d")
            .agg(F.expr("CAST((sum(v) - pmod(sum(v), count(*))) DIV count(*) AS BIGINT)").alias("c"))
        )

    a1 = assign(cent)
    # checkpoint the K x dim iteration-1 centroids (tiny): the second
    # assignment otherwise nests the whole first iteration's lineage
    cent1 = recompute(a1).localCheckpoint(eager=True)
    a2 = assign(cent1)
    return (
        a2.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("dist").cast("long").alias("inertia"),
            # modular reduction INSIDE the sum: dist*vec_id overflows
            # int64 at sf1 id magnitudes (SCALE.md §1245); each reduced
            # term is < 1e9 so the sum is overflow-safe to ~9e9 rows,
            # and (Σx) % M ≡ (Σ(x % M)) % M for non-negative terms —
            # identical values at every SF where the old form was valid
            (
                F.sum(((F.col("dist") % F.lit(1000000007)) * (F.col("vec_id") % F.lit(1000000007))) % F.lit(1000000007))
                % F.lit(1000000007)
            ).cast("long").alias("assign_checksum"),
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
    # ONE pass per edge: the old form ran a BLOCKING driver count()
    # per edge (8 sequential jobs at query construction) plus a second
    # anti-join pass per edge — 16 table scans and 8 job barriers.
    # A left join against the distinct parent keys marks orphans
    # (non-null FK, no parent hit) and one conditional aggregation
    # emits all three measures; the 8 edges fuse into one lazy job
    # (r6 opt, guide §5 "no driver actions in query paths").
    out = None
    for edge, child, ck, parent, pk in _FK_EDGES:
        c = dfs[child]
        p = dfs[parent].select(F.col(pk).alias(ck)).distinct().withColumn("__hit", F.lit(1))
        orphan = F.col(ck).isNotNull() & F.col("__hit").isNull()
        row = (
            c.select(ck)
            .join(p, ck, "left")  # planner picks broadcast vs shuffle per parent size
            .agg(
                F.lit(edge).alias("edge"),
                F.count(F.lit(1)).cast("long").alias("child_rows"),
                F.coalesce(F.sum(orphan.cast("long")), F.lit(0)).cast("long").alias("orphan_rows"),
                F.countDistinct(F.when(orphan, F.col(ck))).cast("long").alias("orphan_keys"),
            )
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
    # eager checkpoint: this 1-row aggregate is broadcast into FOUR
    # consumer branches (ks twice, binned twice) and each broadcast
    # re-evaluates the full lineitem scan+agg otherwise — the
    # two-pass selection algorithm needs exactly 3 scans (meta, bins,
    # in-bin), not 6 (r6 opt, guide §2.4)
    meta = vals.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min("v").alias("vmin"),
        (F.max("v") - F.min("v") + 1).alias("w"),
    ).localCheckpoint(eager=True)
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
        hit.join(F.broadcast(ks.select("qname", "n")), "qname")
        .select("qname", "n", "k", "value_cents")
        .orderBy("qname")
    )


# =====================================================================
# q216 — distribution drift audit (PSI-style, integer-exact)
# =====================================================================

_DRIFT_SPLIT = "2024-01-16 00:00:00"
_DRIFT_B = 10


@query(
    "q216_distribution_drift",
    f"""
    WITH ev AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS v,
             CASE WHEN ts < TIMESTAMP '{_DRIFT_SPLIT}' THEN 0 ELSE 1 END AS period
      FROM events
    ),
    rng AS (SELECT min(v) AS vmin, max(v) - min(v) + 1 AS w FROM ev),
    bb AS (
      SELECT event_type, period,
             CAST(least({_DRIFT_B - 1}, ((v - vmin) * {_DRIFT_B}) // w) AS BIGINT) AS vbin
      FROM ev, rng
    ),
    cnt AS (
      SELECT event_type, vbin,
             CAST(sum(CASE WHEN period = 0 THEN 1 ELSE 0 END) AS BIGINT) AS a_n,
             CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b_n
      FROM bb GROUP BY event_type, vbin
    ),
    tot AS (
      SELECT event_type, sum(a_n) AS a_tot, sum(b_n) AS b_tot FROM cnt GROUP BY event_type
    )
    SELECT c.event_type, c.vbin, c.a_n, c.b_n,
           CAST((1000 * c.a_n) // t.a_tot AS BIGINT) AS share_a_permille,
           CAST((1000 * c.b_n) // t.b_tot AS BIGINT) AS share_b_permille,
           CAST((1000 * c.a_n) // t.a_tot - (1000 * c.b_n) // t.b_tot AS BIGINT) AS delta_permille,
           CAST(length(bin((c.a_n + 1) * (t.b_tot + 1))) AS BIGINT)
             - CAST(length(bin((c.b_n + 1) * (t.a_tot + 1))) AS BIGINT) AS log2_ratio
    FROM cnt c JOIN tot t ON t.event_type = c.event_type
    ORDER BY abs(delta_permille) DESC, c.event_type, c.vbin LIMIT 50
    """,
)
def q216(spark, sf_dir):
    """Distribution-drift audit (PSI shape) between two time periods:
    per (event_type, value decile bin), the permille share in each
    period, the share delta, and an integer floor-log2 likelihood
    ratio (add-1 smoothed, cross-multiplied so counts never leave
    bigint — the q201 trick). This is the pre-training / pre-serving
    check that a feature's distribution hasn't shifted between the
    fitting window and the scoring window.

    100 TB shape: one min/max scan (1-row broadcast), one hash-agg on
    a bounded key domain (types x 10 bins x 2 periods), a per-type
    totals re-roll of the TINY aggregate, and a top-50 TakeOrdered.
    No window, no join wider than the aggregate itself."""
    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("v"),
        F.when(F.col("ts") < F.lit(_DRIFT_SPLIT).cast("timestamp"), 0).otherwise(1).alias("period"),
    )
    rng = ev.agg(F.min("v").alias("vmin"), (F.max("v") - F.min("v") + 1).alias("w"))
    bb = ev.crossJoin(F.broadcast(rng)).select(
        "event_type", "period",
        F.expr(f"CAST(least({_DRIFT_B - 1}, ((v - vmin) * {_DRIFT_B}) DIV w) AS BIGINT)").alias("vbin"),
    )
    cnt = bb.groupBy("event_type", "vbin").agg(
        F.sum(F.when(F.col("period") == 0, 1).otherwise(0)).cast("long").alias("a_n"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("long").alias("b_n"),
    )
    tot = cnt.groupBy("event_type").agg(F.sum("a_n").alias("a_tot"), F.sum("b_n").alias("b_tot"))
    out = (
        cnt.join(F.broadcast(tot), "event_type")
        .select(
            "event_type", "vbin", "a_n", "b_n",
            F.expr("CAST((1000 * a_n) DIV a_tot AS BIGINT)").alias("share_a_permille"),
            F.expr("CAST((1000 * b_n) DIV b_tot AS BIGINT)").alias("share_b_permille"),
            F.expr("CAST((1000 * a_n) DIV a_tot - (1000 * b_n) DIV b_tot AS BIGINT)").alias("delta_permille"),
            (
                F.length(F.expr("bin((a_n + 1) * (b_tot + 1))")).cast("long")
                - F.length(F.expr("bin((b_n + 1) * (a_tot + 1))")).cast("long")
            ).alias("log2_ratio"),
        )
    )
    return out.orderBy(F.abs(F.col("delta_permille")).desc(), "event_type", "vbin").limit(50)


# =====================================================================
# q217 — positional inverted index + phrase query
# =====================================================================

@query(
    "q217_phrase_search",
    """
    WITH tk AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
    ),
    occ AS (
      SELECT doc_id, CAST(i + 1 AS BIGINT) AS pos, toks[CAST(i AS INT) + 1] AS w
      FROM tk, unnest(range(len(toks))) AS u(i)
    ),
    pairs AS (
      SELECT toks[CAST(i AS INT) + 1] AS w1, toks[CAST(i AS INT) + 2] AS w2
      FROM tk, unnest(range(len(toks) - 1)) AS u(i)
    ),
    topq AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n
      FROM pairs GROUP BY w1, w2
      ORDER BY n DESC, w1, w2 LIMIT 1
    ),
    hits AS (
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_occ
      FROM occ a
      JOIN topq q ON a.w = q.w1
      JOIN occ b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.w = q.w2
      GROUP BY a.doc_id
    )
    SELECT h.doc_id, q.w1, q.w2, h.n_occ
    FROM hits h, topq q
    ORDER BY h.n_occ DESC, h.doc_id LIMIT 50
    """,
)
def q217(spark, sf_dir):
    """Positional inverted index + phrase query: build the classic
    (doc_id, position, token) index, pick the corpus's most frequent
    bigram as the demo query, and answer the PHRASE match by joining
    the index against itself on (doc, pos+1) — the adjacency join a
    positional index exists for (arbitrary-length phrases chain more
    of the same join; BM25/q198 ranks what this exact-matches).

    100 TB shape: the index is one explode (token grain, shuffled on
    doc/token only when aggregating); the query terms broadcast, so
    the adjacency self-join only materializes postings of the two
    query words — posting-list-sized, not corpus-sized. Top-50 is a
    TakeOrdered."""
    docs = t(spark, sf_dir, "documents")
    tk = docs.select("doc_id", tokens("text").alias("toks"))
    occ = tk.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("toks"))).alias("pos"), "toks"
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), F.element_at("toks", F.col("pos")).alias("w"))
    pairs = tk.filter(F.size("toks") >= 2).select(
        F.explode(F.sequence(F.lit(1), F.size("toks") - 1)).alias("i"), "toks"
    ).select(
        F.element_at("toks", F.col("i")).alias("w1"),
        F.element_at("toks", F.col("i") + 1).alias("w2"),
    )
    topq = (
        pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.desc("n"), "w1", "w2").limit(1)
    )
    a = occ.alias("a").join(F.broadcast(topq.alias("q")), F.col("a.w") == F.col("q.w1"))
    hits = (
        a.join(
            occ.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1)
            & (F.col("b.w") == F.col("q.w2")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_occ"))
    )
    return (
        hits.crossJoin(F.broadcast(topq.select("w1", "w2")))
        .select("doc_id", "w1", "w2", "n_occ")
        .orderBy(F.desc("n_occ"), "doc_id")
        .limit(50)
    )


# =====================================================================
# q218 — deterministic A/B assignment + conversion lift
# =====================================================================

@query(
    "q218_ab_experiment",
    """
    WITH arms AS (
      SELECT DISTINCT user_id,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS arm
      FROM events
    ),
    peru AS (
      SELECT e.user_id,
             max(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
             CAST(sum(CASE WHEN e.event_type = 'purchase'
                           THEN CAST(round(e.value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS rev_cents
      FROM events e GROUP BY e.user_id
    )
    SELECT a.arm,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(p.converted) AS BIGINT) AS n_converted,
           CAST((1000 * sum(p.converted)) // count(*) AS BIGINT) AS conv_permille,
           CAST(sum(p.rev_cents) AS BIGINT) AS revenue_cents,
           CAST(sum(p.rev_cents) // count(*) AS BIGINT) AS rev_per_user_cents
    FROM arms a JOIN peru p ON p.user_id = a.user_id
    GROUP BY a.arm
    ORDER BY a.arm
    """,
)
def q218(spark, sf_dir):
    """A/B experiment readout with DETERMINISTIC hash assignment:
    users land in arm md5(user_id) % 2 (the salted-bucket assignment
    production experiment platforms use — stable across sessions,
    engines, and retries, no assignment table to join), then per-arm
    conversion and revenue-per-user in exact integer cents/permille.

    100 TB shape: one user-grain hash-agg (map-side combine), the arm
    is a pure column expression (no assignment-table shuffle), and
    the readout is a 2-row aggregate. The same shape extends to
    k-arm / layered experiments by widening the modulus."""
    ev = t(spark, sf_dir, "events")
    peru = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("converted"),
        F.sum(
            F.when(F.col("event_type") == "purchase", F.round(F.col("value") * 100).cast("long")).otherwise(0)
        ).cast("long").alias("rev_cents"),
    )
    peru = peru.withColumn("arm", md5_long(F.col("user_id").cast("string")) % 2)
    return (
        peru.groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("converted").cast("long").alias("n_converted"),
            F.expr("CAST((1000 * sum(converted)) DIV count(*) AS BIGINT)").alias("conv_permille"),
            F.sum("rev_cents").cast("long").alias("revenue_cents"),
            F.expr("CAST(sum(rev_cents) DIV count(*) AS BIGINT)").alias("rev_per_user_cents"),
        )
        .orderBy("arm")
    )


# =====================================================================
# q219 — trailing-baseline spike detection (daily event volumes)
# =====================================================================

@query(
    "q219_volume_spikes",
    """
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    wdw AS (
      SELECT event_type, day, n,
             sum(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prior_sum,
             count(n) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS prior_n
      FROM d
    )
    SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n,
           CAST(prior_sum AS BIGINT) AS prior_sum,
           CASE WHEN 7 * n * 10 > 12 * prior_sum THEN 1 ELSE 0 END AS spike,
           CASE WHEN 7 * n * 10 < 8 * prior_sum THEN 1 ELSE 0 END AS dip
    FROM wdw WHERE prior_n = 7
    ORDER BY event_type, day
    """,
)
def q219(spark, sf_dir):
    """Volume anomaly flags against a trailing 7-day baseline: per
    (event_type, day), compare today's count with the prior-week mean
    using integer cross-multiplication (7*n*10 vs 12*prior_sum is
    'n > 1.2x the trailing mean' with zero float division) — the
    freshness/forecast sentry that pages before a pipeline trains on
    a half-ingested day.

    100 TB shape: the raw scan reduces to DAY grain in one hash-agg
    with map-side combine; the trailing window runs over the bounded
    (type x day) domain — thousands of rows regardless of event
    volume — partitioned by type, never over row-grain data. DATE
    emitted as an ISO string on both engines (the known raw-DATE
    comparator trap)."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    wdw = d.select(
        "event_type", "day", "n",
        F.sum("n").over(w).cast("long").alias("prior_sum"),
        F.count("n").over(w).alias("prior_n"),
    )
    return (
        wdw.filter(F.col("prior_n") == 7)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            "prior_sum",
            F.when(7 * F.col("n") * 10 > 12 * F.col("prior_sum"), 1).otherwise(0).alias("spike"),
            F.when(7 * F.col("n") * 10 < 8 * F.col("prior_sum"), 1).otherwise(0).alias("dip"),
        )
        .orderBy("event_type", "day")
    )


# =====================================================================
# q220 — max drawdown of a signed event flow (two-pass peak tracking)
# =====================================================================

@query(
    "q220_max_drawdown",
    """
    WITH flow AS (
      SELECT event_id, ts,
             CASE WHEN event_type = 'purchase' THEN CAST(round(value * 100) AS BIGINT)
                  ELSE -CAST(round(value * 100) AS BIGINT) END AS f
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    c AS (
      SELECT event_id, f,
             sum(f) OVER (ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM flow
    ),
    r AS (
      SELECT event_id, cum,
             max(cum) OVER (ORDER BY ts_order ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM (SELECT event_id, cum, row_number() OVER (ORDER BY event_id) AS ts_order FROM c) x
    ),
    d AS (SELECT event_id, peak - cum AS dd FROM r)
    SELECT CAST((SELECT count(*) FROM flow) AS BIGINT) AS n_events,
           CAST((SELECT sum(f) FROM flow) AS BIGINT) AS final_cum,
           CAST(max(dd) AS BIGINT) AS max_drawdown_cents,
           CAST(min(CASE WHEN dd = (SELECT max(dd) FROM d) THEN event_id END) AS BIGINT) AS at_event_id
    FROM d
    """,
)
def q220(spark, sf_dir):
    """Max drawdown of a signed cumulative flow (purchases credit,
    errors debit): running balance, running PEAK of the balance, and
    the deepest peak-to-balance gap plus the earliest event where it
    occurs — the running-peak shape behind drawdown, high-water-mark
    billing, and SLA burn-down analyses.

    100 TB shape: BOTH passes are scale-safe two-pass operators —
    global_prefix_sum for the balance and the new
    global_running_max for the peak (bucket-local running max +
    greatest() with the strictly-prior buckets' max; max is not
    additive, so it folds its own offsets) — zero single-partition
    windows (plan-gated). The oracle computes the same thing with
    plain windows. NOTE the oracle orders cum's window by (ts,
    event_id) but peak's by event_id alone: event_id is
    assigned in ts order in the fixtures, making the two orders
    identical — the Spark side uses (ts, event_id) for both."""
    from .operators.windows import global_prefix_sum, global_running_max

    ev = t(spark, sf_dir, "events").filter(F.col("event_type").isin("purchase", "error"))
    flow = ev.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.when(
            F.col("event_type") == "purchase", F.round(F.col("value") * 100).cast("long")
        ).otherwise(-F.round(F.col("value") * 100).cast("long")).alias("f"),
    )
    order = [F.col("ts_us").asc(), F.col("event_id").asc()]
    # Checkpoint the balance frame: global_running_max makes THREE passes
    # over its input (quantile boundaries, per-bucket maxima, the window
    # itself) and `c` contains the full prefix-sum window subtree — uncached,
    # each pass re-ran the scan + bucket shuffle + window (3x the sweep).
    # Eager localCheckpoint materializes it once; q165/q248 precedent
    # (persist() is unsafe here only in join-strategy-sensitive chains —
    # the offset attachments are explicit broadcasts, but localCheckpoint
    # also truncates the lineage the 3 consumers would each replan).
    c = global_prefix_sum(flow, "ts_us", True, order, "f", out_col="cum").localCheckpoint()
    r = global_running_max(c, "ts_us", True, order, "cum", out_col="peak")
    d = r.select("event_id", (F.col("peak") - F.col("cum")).alias("dd"))
    # argmax in ONE aggregation: max(struct(dd, -event_id)) = deepest
    # drawdown, earliest event among ties — the previous max-then-join
    # form evaluated the whole two-pass window subtree twice per
    # execution (once under the broadcast mdd, once in the join probe)
    mx = d.agg(F.max(F.struct(F.col("dd"), (-F.col("event_id")).alias("ne"))).alias("m")).select(
        F.col("m.dd").cast("long").alias("max_drawdown_cents"),
        (-F.col("m.ne")).cast("long").alias("at_event_id"),
    )
    stats = flow.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("f").cast("long").alias("final_cum"),
    )
    return (
        stats.crossJoin(F.broadcast(mx))
        .select("n_events", "final_cum", "max_drawdown_cents", "at_event_id")
    )


# =====================================================================
# q221 — group-wise closed-form OLS regression (integer-exact rational)
# =====================================================================

@query(
    "q221_groupwise_regression",
    """
    WITH pts AS (
      SELECT o_orderpriority AS grp,
             CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS xd,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    ctr AS (SELECT grp, min(xd) AS x0 FROM pts GROUP BY grp),
    s AS (
      SELECT p.grp,
             CAST(count(*) AS BIGINT) AS n,
             sum(p.xd - c.x0) AS sx,
             sum(p.y) AS sy,
             sum((p.xd - c.x0) * p.y) AS sxy,
             sum((p.xd - c.x0) * (p.xd - c.x0)) AS sxx
      FROM pts p JOIN ctr c ON c.grp = p.grp
      GROUP BY p.grp
    ),
    big AS (
      SELECT grp, n,
             CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS num,
             CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT)
               - CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS den,
             CAST(sx AS HUGEINT) AS hsx, CAST(sy AS HUGEINT) AS hsy
      FROM s
    )
    SELECT grp, n,
           CAST((1000 * num) // den AS BIGINT) AS slope_milli_cents_per_day,
           CAST((1000 * hsy - ((1000 * num) // den) * hsx) // (1000 * CAST(n AS HUGEINT)) AS BIGINT) AS intercept_cents
    FROM big
    ORDER BY grp
    """,
)
def q221(spark, sf_dir):
    """Group-wise closed-form least squares: per order priority, the
    OLS slope of order value (cents) over time (days) as an EXACT
    rational (numerator n*Sxy - Sx*Sy over denominator n*Sxx - Sx^2,
    both bigint) plus a milli-cents-per-day truncated quotient — the
    per-segment trend fit feature pipelines compute, with zero float
    accumulation (the order of summation cannot change the answer).
    x is centered at the per-group min date so the moment sums stay
    well inside bigint; both engines' integer division truncates
    toward zero, so the quotient matches bit-for-bit.

    100 TB shape: one hash-agg computes all five moment sums in a
    single pass (map-side combine); the centering join broadcasts the
    per-group minima. The n*Sxy cross terms grow as N^2 and WOULD
    overflow int64 at sf0.1 already, so they are computed in
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — exact to 38 digits,
    which covers 1e10-row groups with room to spare; only the small
    quotients return to bigint. Both engines' integer division
    truncates toward zero, so negative slopes match bit-for-bit."""
    pts = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date")).cast("long").alias("xd"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    ctr = pts.groupBy("grp").agg(F.min("xd").alias("x0"))
    s = (
        pts.join(F.broadcast(ctr), "grp")
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("xd") - F.col("x0")).alias("sx"),
            F.sum("y").alias("sy"),
            F.sum((F.col("xd") - F.col("x0")) * F.col("y")).alias("sxy"),
            F.sum((F.col("xd") - F.col("x0")) * (F.col("xd") - F.col("x0"))).alias("sxx"),
        )
    )
    big = s.select(
        "grp", "n",
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))"
        ).alias("num"),
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))"
            " - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0))"
        ).alias("den"),
        F.expr("CAST(sx AS DECIMAL(38,0))").alias("hsx"),
        F.expr("CAST(sy AS DECIMAL(38,0))").alias("hsy"),
    )
    return big.select(
        "grp", "n",
        F.expr("CAST((1000 * num) div den AS BIGINT)").alias("slope_milli_cents_per_day"),
        F.expr(
            "CAST((1000 * hsy - ((1000 * num) div den) * hsx) div (1000 * CAST(n AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("intercept_cents"),
    ).orderBy("grp")


# =====================================================================
# q222 — association rules over order baskets (support/confidence/lift)
# =====================================================================

_AR_MINSUP = 10  # min baskets containing the pair


@query(
    "q222_association_rules",
    f"""
    WITH basket AS (
      SELECT DISTINCT l.l_orderkey AS oid, p.p_brand AS item
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    nb AS (SELECT CAST(count(DISTINCT oid) AS BIGINT) AS n_baskets FROM basket),
    ia AS (SELECT item, CAST(count(*) AS BIGINT) AS n FROM basket GROUP BY item),
    pair AS (
      SELECT a.item AS item_a, b.item AS item_b, CAST(count(*) AS BIGINT) AS n_ab
      FROM basket a JOIN basket b ON b.oid = a.oid AND a.item < b.item
      GROUP BY a.item, b.item
      HAVING count(*) >= {_AR_MINSUP}
    )
    SELECT p.item_a, p.item_b, p.n_ab,
           ia.n AS n_a, ib.n AS n_b,
           CAST((1000 * p.n_ab) // nb.n_baskets AS BIGINT) AS support_permille,
           CAST((1000 * p.n_ab) // ia.n AS BIGINT) AS confidence_permille,
           CAST((1000 * p.n_ab * nb.n_baskets) // (ia.n * ib.n) AS BIGINT) AS lift_milli
    FROM pair p
    JOIN ia ON ia.item = p.item_a
    JOIN ia ib ON ib.item = p.item_b
    CROSS JOIN nb
    ORDER BY lift_milli DESC, p.item_a, p.item_b LIMIT 50
    """,
)
def q222(spark, sf_dir):
    """Association-rule mining over order baskets at brand grain:
    support, confidence, and lift for co-purchased brand pairs, all
    integer permille/milli (floor division on cross-multiplied bigint
    counts — no float ratios). The min-support HAVING prunes the pair
    table before any ratio math, the same guard q204's collocations
    use.

    100 TB shape: baskets reduce to DISTINCT (order, brand) in one
    hash-agg; the pairwise stage is a self-equi-join on the order key
    whose output is bounded by sum(basket_brand_count^2) — brand
    grain caps the item domain (open item domains pre-prune by item
    support first). Singleton counts and the basket total broadcast
    into the 300-row pair table. Top-50 by lift is a TakeOrdered."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # eager checkpoint of the distinct (order, brand) basket frame: the
    # basket total, the singleton counts (joined twice downstream) and
    # BOTH sides of the pairwise self-join re-read it — without the
    # barrier the lineitem x part build ran 6x per execution (10
    # parquet scans in the final plan; r6 opt). Brand grain bounds the
    # frame at orders x |brands|.
    basket = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("oid"), F.col("p_brand").alias("item"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nb = basket.agg(F.countDistinct("oid").cast("long").alias("n_baskets"))
    ia = basket.groupBy("item").agg(F.count(F.lit(1)).cast("long").alias("n"))
    a, b = basket.alias("a"), basket.alias("b")
    pair = (
        a.join(b, (F.col("b.oid") == F.col("a.oid")) & (F.col("a.item") < F.col("b.item")))
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= _AR_MINSUP)
    )
    ia_a = ia.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))
    ia_b = ia.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))
    out = (
        pair.join(F.broadcast(ia_a), "item_a")
        .join(F.broadcast(ia_b), "item_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "item_a", "item_b", "n_ab", "n_a", "n_b",
            F.expr("CAST((1000 * n_ab) DIV n_baskets AS BIGINT)").alias("support_permille"),
            F.expr("CAST((1000 * n_ab) DIV n_a AS BIGINT)").alias("confidence_permille"),
            F.expr("CAST((1000 * n_ab * n_baskets) DIV (n_a * n_b) AS BIGINT)").alias("lift_milli"),
        )
    )
    return out.orderBy(F.desc("lift_milli"), "item_a", "item_b").limit(50)


# =====================================================================
# q223 — k-hop BFS reachability over the co-purchase graph
# =====================================================================

@query(
    "q223_bfs_khop",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e0 AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    src AS (SELECT min(u) AS s FROM e),
    f0 AS (SELECT s AS node FROM src),
    f1 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN f0 ON e.u = f0.node
      WHERE e.v NOT IN (SELECT node FROM f0)
    ),
    f2 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN f1 ON e.u = f1.node
      WHERE e.v NOT IN (SELECT node FROM f0 UNION ALL SELECT node FROM f1)
    ),
    f3 AS (
      SELECT DISTINCT e.v AS node FROM e JOIN f2 ON e.u = f2.node
      WHERE e.v NOT IN (SELECT node FROM f0 UNION ALL SELECT node FROM f1
                        UNION ALL SELECT node FROM f2)
    ),
    lvl AS (
      SELECT 1 AS hop, node FROM f1
      UNION ALL SELECT 2, node FROM f2
      UNION ALL SELECT 3, node FROM f3
    )
    SELECT hop,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) % 1000000007 AS BIGINT) AS node_checksum
    FROM lvl GROUP BY hop ORDER BY hop
    """,
)
def q223(spark, sf_dir):
    """3-hop BFS from a deterministic source over the
    support-thresholded co-purchase graph (q165's sparsifier): each
    hop is one frontier-edge join + a visited anti-join — exact
    shortest-path levels with per-hop node counts and checksums. The
    frontier-expansion pattern generalizes to friend-of-friend
    features, blast-radius analyses, and bounded graph neighborhoods.

    100 TB shape: per hop, one equi-join of the (small) frontier with
    the edge list — broadcastable while the frontier is small, a
    hash-join shuffle keyed on int node ids once it isn't — plus an
    anti-join against the visited set (ints only, never attributes).
    Hop count bounds the iteration; the edge list is the support>=2
    sparsified graph (SCALE.md §30), not the raw near-complete
    co-occurrence."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    e0 = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    # eager checkpoint of the sparsified edge list (q165's trick): the
    # expensive build (distinct + self-join + groupBy + symmetrize) is
    # referenced by the source pick AND by every hop, and each hop's
    # frontier lineage nests the previous hops' — without the barrier
    # the final plan expanded the edge build into 160 parquet scans
    # (r6 opt; the edge set is support-sparsified and bounded)
    e = e0.unionAll(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).localCheckpoint(
        eager=True
    )
    src = e.agg(F.min("u").alias("node"))
    frontiers = [src]
    visited = src
    for _ in range(3):
        prev = frontiers[-1]
        nxt = (
            e.join(F.broadcast(prev.select(F.col("node").alias("u"))), "u")
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
        )
        frontiers.append(nxt)
        visited = visited.unionAll(nxt)
    lvl = None
    for hop, f in enumerate(frontiers[1:], start=1):
        part = f.select(F.lit(hop).alias("hop"), "node")
        lvl = part if lvl is None else lvl.unionAll(part)
    return (
        lvl.groupBy("hop")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            (F.sum("node") % F.lit(1000000007)).cast("long").alias("node_checksum"),
        )
        .orderBy("hop")
    )


# =====================================================================
# q224 — FIFO lot matching (receipts vs returns, interval overlap)
# =====================================================================

@query(
    "q224_fifo_matching",
    """
    WITH rec AS (
      SELECT l_partkey, l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc
      FROM lineitem WHERE l_returnflag <> 'R'
    ),
    iss AS (
      SELECT l_partkey, l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT) AS qty,
             sum(CAST(l_quantity AS BIGINT)) OVER (
               PARTITION BY l_partkey ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ic
      FROM lineitem WHERE l_returnflag = 'R'
    ),
    m AS (
      SELECT r.l_partkey,
             least(r.rc, i.ic) - greatest(r.rc - r.qty, i.ic - i.qty) AS matched
      FROM rec r JOIN iss i
        ON i.l_partkey = r.l_partkey
       AND r.rc > i.ic - i.qty AND r.rc - r.qty < i.ic
    ),
    tot AS (
      SELECT l_partkey,
             CAST(sum(matched) AS BIGINT) AS matched_qty,
             CAST(count(*) AS BIGINT) AS n_matches
      FROM m GROUP BY l_partkey
    ),
    itot AS (SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS issue_qty FROM iss GROUP BY l_partkey)
    SELECT t.l_partkey, t.n_matches, t.matched_qty,
           i.issue_qty - t.matched_qty AS unmatched_issue_qty
    FROM tot t JOIN itot i ON i.l_partkey = t.l_partkey
    ORDER BY t.matched_qty DESC, t.l_partkey LIMIT 50
    """,
)
def q224(spark, sf_dir):
    """FIFO lot matching — the inventory/cost-basis primitive: per
    part, shipped lots (receipts) and returns (issues) each get a
    cumulative-quantity interval via a PARTITIONED running sum; lot i
    funds issue j by exactly the overlap of their intervals, which is
    the closed-form FIFO allocation (no loops, no state machine).
    Matched/unmatched totals per part fall out of one aggregation.

    100 TB shape: the running sums are part-partitioned windows
    (per-key sequences, never a global sort); the overlap join is an
    equi-join on part plus interval predicates whose OUTPUT is linear
    (consecutive intervals overlap a contiguous run) — at extreme
    per-key depth the banding trick from q115's interval join applies
    unchanged (bucket by cumulative-quantity range). Everything is
    bigint quantities."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")

    def cum(df):
        w = Window.partitionBy("l_partkey").orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        return df.select(
            "l_partkey",
            F.col("l_quantity").cast("long").alias("qty"),
            F.sum(F.col("l_quantity").cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ).alias("c"),
        )

    rec = cum(li.filter(F.col("l_returnflag") != "R")).withColumnRenamed("c", "rc")
    iss = cum(li.filter(F.col("l_returnflag") == "R")).withColumnRenamed("c", "ic")
    r, i = rec.alias("r"), iss.alias("i")
    m = (
        r.join(
            i,
            (F.col("i.l_partkey") == F.col("r.l_partkey"))
            & (F.col("r.rc") > F.col("i.ic") - F.col("i.qty"))
            & (F.col("r.rc") - F.col("r.qty") < F.col("i.ic")),
        )
        .select(
            F.col("r.l_partkey").alias("l_partkey"),
            (
                F.least(F.col("r.rc"), F.col("i.ic"))
                - F.greatest(F.col("r.rc") - F.col("r.qty"), F.col("i.ic") - F.col("i.qty"))
            ).alias("matched"),
        )
    )
    tot = m.groupBy("l_partkey").agg(
        F.sum("matched").cast("long").alias("matched_qty"),
        F.count(F.lit(1)).cast("long").alias("n_matches"),
    )
    itot = iss.groupBy("l_partkey").agg(F.sum("qty").cast("long").alias("issue_qty"))
    return (
        tot.join(itot, "l_partkey")
        .select(
            "l_partkey", "n_matches", "matched_qty",
            (F.col("issue_qty") - F.col("matched_qty")).alias("unmatched_issue_qty"),
        )
        .orderBy(F.desc("matched_qty"), "l_partkey")
        .limit(50)
    )


# =====================================================================
# q225 — 2D skyline (Pareto frontier) via exclusive global running max
# =====================================================================

@query(
    "q225_skyline",
    """
    WITH pts AS (
      SELECT CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
             CAST(p_size AS BIGINT) AS psize,
             CAST(count(*) AS BIGINT) AS n_parts
      FROM part GROUP BY 1, 2
    ),
    scan AS (
      SELECT price_cents, psize, n_parts,
             max(psize) OVER (ORDER BY price_cents, psize DESC
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mexcl
      FROM pts
    )
    SELECT price_cents, psize, n_parts
    FROM scan
    WHERE mexcl IS NULL OR mexcl < psize
    ORDER BY price_cents, psize
    """,
)
def q225(spark, sf_dir):
    """2D skyline / Pareto frontier (minimize price, maximize size):
    over DISTINCT (price, size) pairs ordered by (price asc, size
    desc), a pair is dominated exactly when the STRICTLY-BEFORE
    running max of size reaches it — one linear pass instead of the
    naive all-pairs domination join. The distinct-pair pre-aggregation
    is the other half of the trick: duplicates collapse before any
    ordered work (multiplicity re-attached as n_parts).

    100 TB shape: one hash-agg to pair grain, then the EXCLUSIVE
    global running max runs on the two-pass range-partitioned
    operator (operators/windows.global_running_max(exclusive=True)) —
    no single-partition sort (plan-gated). The same shape extends to
    d>2 via repeated passes or block-nested skylines; 2D is the
    closed-form case."""
    from .operators.windows import global_running_max

    pts = (
        t(spark, sf_dir, "part")
        .groupBy(
            F.round(F.col("p_retailprice") * 100).cast("long").alias("price_cents"),
            F.col("p_size").cast("long").alias("psize"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_parts"))
    )
    order = [F.col("price_cents").asc(), F.col("psize").desc()]
    scan = global_running_max(
        pts, "price_cents", True, order, "psize", out_col="mexcl", exclusive=True
    )
    return (
        scan.filter(F.col("mexcl").isNull() | (F.col("mexcl") < F.col("psize")))
        .select("price_cents", "psize", "n_parts")
        .orderBy("price_cents", "psize")
    )


# =====================================================================
# q226 — exact weighted quantiles (histogram narrowing on weights)
# =====================================================================

@query(
    "q226_weighted_median",
    """
    WITH vals AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(l_quantity AS BIGINT) AS wt
      FROM lineitem
    ),
    meta AS (SELECT CAST(sum(wt) AS BIGINT) AS tw FROM vals),
    ks AS (
      SELECT q.qname, ((meta.tw - 1) * q.pct) // 100 + 1 AS k, meta.tw
      FROM (SELECT 'p50' AS qname, 50 AS pct UNION ALL SELECT 'p90', 90) q, meta
    ),
    ordered AS (
      SELECT v, sum(wt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cw
      FROM (SELECT v, sum(wt) AS wt FROM vals GROUP BY v)
    )
    SELECT ks.qname, ks.tw, ks.k,
           (SELECT min(o.v) FROM ordered o WHERE o.cw >= ks.k) AS value_cents
    FROM ks
    ORDER BY ks.qname
    """,
)
def q226(spark, sf_dir):
    """Exact WEIGHTED quantiles (weight = quantity): the k-th unit of
    weight, k = floor((W-1)*pct/100)+1 — the order statistic of the
    weight-expanded multiset, computed WITHOUT expanding it. Same
    two-pass histogram narrowing as q215 but every count becomes a
    weight sum: pass 1 bins weights into 4096 buckets and locates the
    bucket holding the k-th unit; pass 2 rescans only that bucket and
    finds the answer by per-value weight accumulation. The oracle is
    again a different algorithm (full sort + running weight).

    100 TB shape: two narrow scans with map-side combine; windows
    only over the bounded 4096-bucket frame and the candidate
    bucket's value domain. Weighted medians power robust aggregation
    (e.g. per-segment price indices) where plain medians misweight
    multi-unit rows."""
    from pyspark.sql import Window

    vals = t(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    # eager checkpoint of the 1-row meta aggregate — same multi-branch
    # re-evaluation defect and same fix as q215 (r6 opt, guide §2.4)
    meta = vals.agg(
        F.sum("wt").cast("long").alias("tw"),
        F.min("v").alias("vmin"),
        (F.max("v") - F.min("v") + 1).alias("w"),
    ).localCheckpoint(eager=True)
    qs = spark.createDataFrame([("p50", 50), ("p90", 90)], "qname string, pct int")
    ks = qs.crossJoin(F.broadcast(meta)).select(
        "qname", "tw", "vmin", "w", F.expr("((tw - 1) * pct) DIV 100 + 1").alias("k")
    )
    binned = vals.crossJoin(F.broadcast(meta.select("vmin", "w"))).select(
        "v", "wt", F.expr(f"least(CAST({_SEL_B - 1} AS BIGINT), ((v - vmin) * {_SEL_B}) DIV w)").alias("bin")
    )
    bins = binned.groupBy("bin").agg(F.sum("wt").alias("cnt"))
    wb = Window.orderBy("bin")  # bounded: <= 4096 rows
    bins_c = bins.withColumn("cum", F.sum("cnt").over(wb)).withColumn(
        "cum_prev", F.col("cum") - F.col("cnt")
    )
    cand = ks.join(
        F.broadcast(bins_c), (F.col("cum") >= F.col("k")) & (F.col("cum_prev") < F.col("k"))
    ).select("qname", "tw", "k", "bin", "cum_prev")
    in_bin = binned.join(F.broadcast(cand.select("qname", "k", "bin", "cum_prev")), "bin")
    perv = in_bin.groupBy("qname", "k", "cum_prev", "v").agg(F.sum("wt").alias("c"))
    wv = Window.partitionBy("qname").orderBy("v")
    hit = (
        perv.withColumn("cumv", F.sum("c").over(wv) + F.col("cum_prev"))
        .filter(F.col("cumv") >= F.col("k"))
        .groupBy("qname", "k")
        .agg(F.min("v").alias("value_cents"))
    )
    return (
        hit.join(F.broadcast(ks.select("qname", "tw")), "qname")
        .select("qname", "tw", "k", "value_cents")
        .orderBy("qname")
    )


# =====================================================================
# sdk13 — incremental join MV + SQL view through the engine
# =====================================================================

@query(
    "sdk13_join_mv_view",
    """
    WITH j AS (
      SELECT c.c_nationkey, CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    ),
    agg AS (
      SELECT c_nationkey,
             CAST(sum(cents) AS BIGINT) AS revenue_cents,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM j GROUP BY c_nationkey
    )
    SELECT n.n_name AS nation, a.revenue_cents, a.n_orders
    FROM agg a JOIN nation n ON n.n_nationkey = a.c_nationkey
    ORDER BY nation
    """,
)
def sdk13(spark, sf_dir):
    """Incremental JOIN materialized view + SQL view, end-to-end
    through the engine and under the driver's hash gate: customers
    load fully, orders arrive in TWO batches with an incremental
    refresh after each (the second fold applies ΔL ⋈ R only), and the
    result is read through a catalog SQL view that joins nation names
    at query time. The oracle states the equivalent one-shot join
    aggregate over the raw fixtures — so the driver verifies that two
    incremental IVM folds plus late-bound view expansion equal the
    from-scratch answer bit-for-bit.

    100 TB shape: each refresh is delta-sized (SCALE.md §51), the
    view expansion is metadata (§52), and the final read is one
    broadcast join of the 25-nation dim."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("c_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    with eng.node_context("wc", outputs={"out": "cust_t"}):
        tc = Table("out", "w")
        tc.init(add_monotonic_id="mid")
        tc.append(cust)
        tc.flush()
    with eng.node_context("wn", outputs={"out": "nation_t"}):
        tn = Table("out", "w")
        tn.append(nat)
        tn.flush()
    with eng.node_context("wo", outputs={"out": "orders_t"}):
        to = Table("out", "w")
        to.init(add_monotonic_id="mid")
        to.append(orders.filter(F.col("o_orderkey") % 2 == 0))
        to.flush()
    mv = eng.create_materialized_join_view(
        "rev_by_nat",
        left="orders_t",
        right="cust_t",
        on=["c_custkey"],
        order_by={"orders_t": "mid", "cust_t": "mid"},
        dims=["c_nationkey"],
        measures={"revenue_cents": ("sum", "cents"), "n_orders": ("count", "*")},
    )
    mv.refresh()
    with eng.node_context("wo", outputs={"out": "orders_t"}):
        to = Table("out", "w")
        to.append(orders.filter(F.col("o_orderkey") % 2 == 1))
        to.flush()
    mv.refresh()  # second fold: dL x R only
    eng.create_view(
        "rev_named",
        "SELECT n.n_name AS nation, a.revenue_cents, a.n_orders "
        "FROM {{ rev_by_nat }} a JOIN {{ nation_t }} n ON n.n_nationkey = a.c_nationkey",
    )
    rendered = eng.render_sql(
        "SELECT nation, revenue_cents, n_orders FROM {{ rev_named }} ORDER BY nation"
    )
    return spark.sql(rendered)


# =====================================================================
# q227 — per-node graph features (degree / wedges / triangles / lcc)
# =====================================================================

@query(
    "q227_node_graph_features",
    """
    WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey HAVING count(*) >= 2
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e) t
      GROUP BY node
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    ntri AS (
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri
      FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri) t
      GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(d.degree * (d.degree - 1) // 2 AS BIGINT) AS wedges,
           COALESCE(t.n_tri, 0) AS triangles,
           CASE WHEN d.degree >= 2
                THEN CAST((1000 * COALESCE(t.n_tri, 0)) // (d.degree * (d.degree - 1) // 2) AS BIGINT)
                ELSE 0 END AS lcc_permille
    FROM deg d LEFT JOIN ntri t ON t.node = d.node
    ORDER BY d.degree DESC, d.node LIMIT 50
    """,
)
def q227(spark, sf_dir):
    """Node-grain graph featurization over the sparsified co-purchase
    graph: degree, wedge count, per-node triangle membership, and
    local clustering coefficient in integer permille — the feature
    vector graph-ML pipelines attach to every entity before training
    (q165 reports the same quantities at GRAPH grain; this is the
    per-node breakdown).

    100 TB shape: identical join skeleton to q165 (support>=2
    sparsifier bounds the edge list; the triangle enumeration is the
    standard oriented three-way join), plus two int-keyed hash-aggs
    to node grain. Top-50 by degree is a TakeOrdered."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a, b = li.alias("a"), li.alias("b")
    e = (
        a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (F.col("a.l_partkey") < F.col("b.l_partkey")))
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("u", "v")
    )
    # eager checkpoint of the sparsified edge list (q165/q223 trick):
    # the degree union reads it twice and the oriented triangle join
    # three more times — without the barrier the li self-join build
    # expanded into 22 parquet scans in the final plan (r6 opt)
    e = e.localCheckpoint(eager=True)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(e3, (F.col("e3.u") == F.col("e1.u")) & (F.col("e3.v") == F.col("e2.v")))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"), F.col("e2.v").alias("c"))
    )
    ntri = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tri"))
    )
    out = (
        deg.join(ntri, "node", "left")
        .select(
            "node", "degree",
            F.expr("CAST(degree * (degree - 1) DIV 2 AS BIGINT)").alias("wedges"),
            F.coalesce(F.col("n_tri"), F.lit(0)).cast("long").alias("triangles"),
            F.expr(
                "CASE WHEN degree >= 2 THEN CAST((1000 * coalesce(n_tri, 0)) DIV (degree * (degree - 1) DIV 2) AS BIGINT) ELSE 0 END"
            ).alias("lcc_permille"),
        )
    )
    return out.orderBy(F.desc("degree"), "node").limit(50)


# =====================================================================
# q228 — SCD type-2 dimension build (change-compressed intervals)
# =====================================================================

@query(
    "q228_scd2_build",
    """
    WITH obs AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             min(o_orderpriority) AS prio
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    ),
    chg AS (
      SELECT o_custkey, d, prio,
             lag(prio) OVER (PARTITION BY o_custkey ORDER BY d) AS prev
      FROM obs
    ),
    ver AS (
      SELECT o_custkey, d AS valid_from, prio,
             row_number() OVER (PARTITION BY o_custkey ORDER BY d) AS version_no,
             lead(d) OVER (PARTITION BY o_custkey ORDER BY d) AS next_from
      FROM chg WHERE prev IS NULL OR prev <> prio
    )
    SELECT o_custkey, CAST(version_no AS BIGINT) AS version_no, prio,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           COALESCE(strftime(next_from, '%Y-%m-%d'), '9999-12-31') AS valid_to
    FROM ver
    WHERE o_custkey % 97 = 0
    ORDER BY o_custkey, version_no
    """,
)
def q228(spark, sf_dir):
    """Slowly-changing-dimension type-2 build: per customer, compress
    the observed attribute series (order priority by order date) to
    its CHANGE POINTS, then derive half-open validity intervals
    [valid_from, valid_to) with lead() — the standard SCD2
    construction (change compression -> interval derivation) behind
    every point-in-time dimension join (q186's training matrix is the
    consumer side). Dates are emitted as ISO strings on both engines
    (the raw-DATE comparator trap).

    100 TB shape: one hash-agg to (customer, day) grain, then
    customer-PARTITIONED windows (per-key sequences — parallel, never
    a global sort). The % 97 slice keeps the driver-compared output
    bounded; the build itself is full-table."""
    from pyspark.sql import Window

    obs = (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.min("o_orderpriority").alias("prio"))
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    chg = obs.withColumn("prev", F.lag("prio").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("prio"))
    )
    ver = chg.select(
        "o_custkey",
        F.col("d").alias("valid_from"),
        "prio",
        F.row_number().over(w).cast("long").alias("version_no"),
        F.lead("d").over(w).alias("next_from"),
    )
    return (
        ver.filter(F.col("o_custkey") % 97 == 0)
        .select(
            "o_custkey", "version_no", "prio",
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            F.coalesce(F.date_format("next_from", "yyyy-MM-dd"), F.lit("9999-12-31")).alias("valid_to"),
        )
        .orderBy("o_custkey", "version_no")
    )


# =====================================================================
# q229 — point-in-time join INTO the SCD2 dimension (as-of semantics)
# =====================================================================

@query(
    "q229_scd2_pit_join",
    """
    WITH obs AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             min(o_orderpriority) AS prio
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    ),
    chg AS (
      SELECT o_custkey, d, prio,
             lag(prio) OVER (PARTITION BY o_custkey ORDER BY d) AS prev
      FROM obs
    ),
    dim AS (
      SELECT o_custkey, d AS valid_from, prio,
             COALESCE(lead(d) OVER (PARTITION BY o_custkey ORDER BY d), DATE '9999-12-31') AS valid_to
      FROM chg WHERE prev IS NULL OR prev <> prio
    ),
    facts AS (
      SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS od,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    pit AS (
      SELECT f.o_orderkey, f.cents, dim.prio AS prio_at_order
      FROM facts f JOIN dim
        ON dim.o_custkey = f.o_custkey
       AND f.od >= dim.valid_from AND f.od < dim.valid_to
    )
    SELECT prio_at_order,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(o_orderkey) % 1000000007 AS BIGINT) AS key_checksum
    FROM pit GROUP BY prio_at_order
    ORDER BY prio_at_order
    """,
)
def q229(spark, sf_dir):
    """Point-in-time join into the SCD2 dimension q228 builds: every
    fact row picks the dimension version whose [valid_from, valid_to)
    interval contains its date — the consumer half of SCD2 and the
    leakage-free alternative to joining current attributes onto
    historical facts. Every fact matches EXACTLY one version (the
    intervals partition time), which the per-priority rollup
    cross-checks via the key checksum.

    100 TB shape: the dim is change-compressed (tiny vs facts); the
    join is an equi-join on the entity key plus interval predicates —
    at extreme version depth the q115 banding applies. Windows only
    on the customer-partitioned dim build."""
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders")
    obs = orders.groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("d")).agg(
        F.min("o_orderpriority").alias("prio")
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    chg = obs.withColumn("prev", F.lag("prio").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("prio"))
    )
    dim = chg.select(
        "o_custkey",
        F.col("d").alias("valid_from"),
        "prio",
        F.coalesce(F.lead("d").over(w), F.lit("9999-12-31").cast("date")).alias("valid_to"),
    )
    facts = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    pit = facts.join(
        dim,
        (dim["o_custkey"] == facts["o_custkey"])
        & (facts["od"] >= dim["valid_from"])
        & (facts["od"] < dim["valid_to"]),
    ).select("o_orderkey", "cents", F.col("prio").alias("prio_at_order"))
    return (
        pit.groupBy("prio_at_order")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("cents").cast("long").alias("revenue_cents"),
            (F.sum("o_orderkey") % F.lit(1000000007)).cast("long").alias("key_checksum"),
        )
        .orderBy("prio_at_order")
    )


# =====================================================================
# q230 — interval union length (sweep-line merge of overlapping spans)
# =====================================================================

@query(
    "q230_interval_union",
    """
    WITH iv AS (
      SELECT l_suppkey,
             CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT) AS s,
             CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS BIGINT)
               + CAST(l_quantity AS BIGINT) % 10 AS e
      FROM lineitem
    ),
    swept AS (
      SELECT l_suppkey, s, e,
             max(e) OVER (PARTITION BY l_suppkey ORDER BY s, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      FROM iv
    ),
    isl AS (
      SELECT l_suppkey, s, e,
             sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
               OVER (PARTITION BY l_suppkey ORDER BY s, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM swept
    ),
    merged AS (
      SELECT l_suppkey, island, min(s) AS ms, max(e) AS me
      FROM isl GROUP BY l_suppkey, island
    )
    SELECT l_suppkey,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(sum(me - ms + 1) AS BIGINT) AS covered_days
    FROM merged
    GROUP BY l_suppkey
    ORDER BY covered_days DESC, l_suppkey LIMIT 50
    """,
)
def q230(spark, sf_dir):
    """Interval union per supplier (total days with at least one
    shipment in transit, transit span derived deterministically from
    quantity since the fixture has no receipt date): the classic
    sweep-line merge — sort spans,
    flag a NEW island whenever a span starts after the running max of
    previous ends, number islands with a running sum of flags, then
    aggregate each island to its hull. Two partitioned window passes
    turn an O(n^2) overlap problem into a linear sweep — the
    gaps-and-islands pattern behind downtime accounting, in-transit
    exposure, and coverage metrics.

    100 TB shape: both windows are supplier-PARTITIONED per-key
    sequences (parallel across keys, never a global sort); integer
    day arithmetic end to end."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    sday = F.datediff(F.col("l_shipdate").cast("date"), F.lit("1992-01-01").cast("date")).cast("long")
    iv = li.select(
        "l_suppkey",
        sday.alias("s"),
        (sday + F.col("l_quantity").cast("long") % 10).alias("e"),
    )
    w = Window.partitionBy("l_suppkey").orderBy("s", "e")
    swept = iv.withColumn("prev_max", F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)))
    isl = swept.withColumn(
        "island",
        F.sum(
            F.when(F.col("prev_max").isNull() | (F.col("s") > F.col("prev_max")), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = isl.groupBy("l_suppkey", "island").agg(F.min("s").alias("ms"), F.max("e").alias("me"))
    return (
        merged.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_islands"),
            F.sum(F.col("me") - F.col("ms") + 1).cast("long").alias("covered_days"),
        )
        .orderBy(F.desc("covered_days"), "l_suppkey")
        .limit(50)
    )


# =====================================================================
# q231 — dedup-cluster representative selection (keep-best-of-cluster)
# =====================================================================

@query(
    "q231_cluster_representative",
    """
    WITH norm AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST('0x' || substr(md5(array_to_string(
               string_split_regex(trim(lower(text)), '\\s+')[1:3], ' ')), 1, 15) AS BIGINT) AS fp
      FROM documents
    ),
    clus AS (
      SELECT fp, CAST(count(*) AS BIGINT) AS cluster_size, max(n_chars) AS best_chars
      FROM norm GROUP BY fp HAVING count(*) >= 2
    ),
    rep AS (
      SELECT n.fp, min(n.doc_id) AS rep_doc_id
      FROM norm n JOIN clus c ON c.fp = n.fp AND n.n_chars = c.best_chars
      GROUP BY n.fp
    )
    SELECT c.fp, c.cluster_size, r.rep_doc_id, c.best_chars,
           c.cluster_size - 1 AS n_discarded
    FROM clus c JOIN rep r ON r.fp = c.fp
    ORDER BY c.cluster_size DESC, c.fp LIMIT 50
    """,
)
def q231(spark, sf_dir):
    """Representative selection for dedup clusters — the step between
    detection (q33/q34/q58) and curation: cluster documents by a
    normalized 3-word-prefix blocking fingerprint (lowercase,
    whitespace-split — the sorted-neighborhood key near-dup pipelines
    canonicalize within), then keep one canonical doc
    per cluster by the deterministic policy (longest text, then
    smallest id) and count what gets discarded. The argmax is the
    cross-engine two-aggregate form (max score per cluster, then min
    id among the tied best) — no window, no nondeterministic FIRST.

    100 TB shape: normalization + hashing are map-side (60-bit
    fingerprints shuffle, never text); the policy join touches only
    clusters with >=2 members. Top-50 by size is a TakeOrdered."""
    docs = t(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        md5_long(
            F.concat_ws(" ", F.slice(F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 3))
        ).alias("fp"),
    )
    clus = (
        norm.groupBy("fp")
        .agg(F.count(F.lit(1)).cast("long").alias("cluster_size"), F.max("n_chars").alias("best_chars"))
        .filter(F.col("cluster_size") >= 2)
    )
    n_a = norm.alias("n")
    c_a = clus.alias("c")
    rep = (
        n_a.join(
            c_a,
            (F.col("n.fp") == F.col("c.fp")) & (F.col("n.n_chars") == F.col("c.best_chars")),
        )
        .groupBy(F.col("n.fp").alias("rfp"))
        .agg(F.min("doc_id").alias("rep_doc_id"))
    )
    return (
        clus.join(rep, clus["fp"] == rep["rfp"])
        .select(
            "fp", "cluster_size", "rep_doc_id", "best_chars",
            (F.col("cluster_size") - 1).alias("n_discarded"),
        )
        .orderBy(F.desc("cluster_size"), "fp")
        .limit(50)
    )


# =====================================================================
# q232 — audience overlap matrix (bitmap AND + popcount, exact)
# =====================================================================

@query(
    "q232_audience_overlap",
    """
    WITH bm AS (
      SELECT event_type, user_id // 63 AS bucket,
             bit_or(CAST(1 AS BIGINT) << CAST(user_id % 63 AS INT)) AS m
      FROM events GROUP BY event_type, user_id // 63
    ),
    pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             sum(bit_count(a.m & b.m)) AS n_overlap
      FROM bm a JOIN bm b ON a.bucket = b.bucket AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    ),
    sz AS (
      SELECT event_type, CAST(sum(bit_count(m)) AS BIGINT) AS n_users FROM bm GROUP BY event_type
    )
    SELECT p.type_a, p.type_b,
           sa.n_users AS n_a, sb.n_users AS n_b,
           CAST(p.n_overlap AS BIGINT) AS n_overlap,
           CAST((1000 * p.n_overlap) // least(sa.n_users, sb.n_users) AS BIGINT) AS containment_permille
    FROM pair p
    JOIN sz sa ON sa.event_type = p.type_a
    JOIN sz sb ON sb.event_type = p.type_b
    ORDER BY p.type_a, p.type_b
    """,
)
def q232(spark, sf_dir):
    """Exact audience-overlap matrix: per event type, the user set as
    63-bit bitmap words (the q164 encoding); every pair's intersection
    is popcount(AND) summed over co-located buckets — |A∩B| for all
    type pairs in ONE pass over the bitmaps, plus a containment
    permille against the smaller audience. The bitmap-AND form is why
    mergeable bitmap indexes beat count(distinct) for overlap
    reporting: k audiences need k bitmaps, not k^2 distinct-counts.

    100 TB shape: user ids reduce to (bucket, 64-bit word) — 63
    users per row — so the pairwise join is bitmap-sized, not
    user-sized, co-partitioned on bucket; popcount is JVM bit math.
    Audience sizes fall out of the same bitmaps for free."""
    ev = t(spark, sf_dir, "events")
    bm = (
        ev.select("event_type", F.expr("user_id DIV 63").alias("bucket"),
                  F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))").alias("bit"))
        .groupBy("event_type", "bucket")
        .agg(F.expr("bit_or(bit)").alias("m"))
    )
    a, b = bm.alias("a"), bm.alias("b")
    pair = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.event_type") < F.col("b.event_type")))
        .groupBy(F.col("a.event_type").alias("type_a"), F.col("b.event_type").alias("type_b"))
        .agg(F.sum(F.expr("bit_count(a.m & b.m)")).alias("n_overlap"))
    )
    sz = bm.groupBy("event_type").agg(F.sum(F.expr("bit_count(m)")).cast("long").alias("n_users"))
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        pair.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a", "type_b", "n_a", "n_b",
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.expr("CAST((1000 * n_overlap) DIV least(n_a, n_b) AS BIGINT)").alias("containment_permille"),
        )
        .orderBy("type_a", "type_b")
    )


# =====================================================================
# q233 — strict-order funnel (signup -> click -> purchase chain)
# =====================================================================

@query(
    "q233_ordered_funnel",
    """
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id AND e.ts > s1.t1
      WHERE e.event_type = 'click'
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id AND e.ts > s2.t2
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM s1) AS BIGINT) AS n_signup,
           CAST((SELECT count(*) FROM s2) AS BIGINT) AS n_clicked_after,
           CAST((SELECT count(*) FROM s3) AS BIGINT) AS n_purchased_after,
           CAST((SELECT sum(CAST(floor(epoch(t2)) AS BIGINT) - CAST(floor(epoch(t1)) AS BIGINT))
                 FROM s2 JOIN s1 ON s1.user_id = s2.user_id) AS BIGINT) AS sum_s1_to_s2_secs,
           CAST((SELECT sum(CAST(floor(epoch(t3)) AS BIGINT) - CAST(floor(epoch(t2)) AS BIGINT))
                 FROM s3 JOIN s2 ON s2.user_id = s3.user_id) AS BIGINT) AS sum_s2_to_s3_secs
    """,
)
def q233(spark, sf_dir):
    """Strict-ORDER funnel: users who signed up, then clicked strictly
    AFTER their first signup, then purchased strictly after that
    click — the min-timestamp chain (t1 < t2 < t3), which plain
    'did all three events' set intersection over-counts. Latency sums
    ride along in integer seconds (floored epoch on both engines —
    the q113 trap).

    100 TB shape: three user-grain hash-aggs chained by equi-joins on
    user_id — each stage's frame shrinks monotonically, nothing
    row-grain survives the first aggregation. The same chain extends
    to k steps linearly (one agg + join per step), the scalable form
    of funnel queries that window-function PATTERN matching cannot
    partition."""
    ev = t(spark, sf_dir, "events")
    # eager checkpoints per funnel stage: s1 feeds s2 + a latency join
    # + its count, s2 feeds s3 + two latency joins + its count, and the
    # stage lineage NESTS (s3 contains s2 contains s1) — without the
    # barriers the final plan re-expanded the chain into 14 events
    # scans where the k-step funnel needs exactly k (r6 opt). Each
    # stage frame is user-grain (monotonically shrinking), so the
    # materialization is bounded.
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint(eager=True)
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint(eager=True)
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
        .localCheckpoint(eager=True)
    )
    lat12 = (
        s2.join(s1, "user_id")
        .agg(F.sum(F.unix_timestamp("t2").cast("long") - F.unix_timestamp("t1").cast("long")).alias("d12"))
    )
    lat23 = (
        s3.join(s2, "user_id")
        .agg(F.sum(F.unix_timestamp("t3").cast("long") - F.unix_timestamp("t2").cast("long")).alias("d23"))
    )
    c1 = s1.agg(F.count(F.lit(1)).cast("long").alias("n_signup"))
    c2 = s2.agg(F.count(F.lit(1)).cast("long").alias("n_clicked_after"))
    c3 = s3.agg(F.count(F.lit(1)).cast("long").alias("n_purchased_after"))
    return (
        c1.crossJoin(F.broadcast(c2))
        .crossJoin(F.broadcast(c3))
        .crossJoin(F.broadcast(lat12.select(F.col("d12").cast("long").alias("sum_s1_to_s2_secs"))))
        .crossJoin(F.broadcast(lat23.select(F.col("d23").cast("long").alias("sum_s2_to_s3_secs"))))
    )


# =====================================================================
# q234 — DAU/WAU stickiness (exact distincts, integer permille)
# =====================================================================

@query(
    "q234_stickiness",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events GROUP BY 1, 2
    ),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM d GROUP BY day),
    wk AS (
      SELECT CAST(date_diff('day', DATE '2024-01-01', day) AS BIGINT) // 7 AS week, user_id
      FROM d GROUP BY 1, 2
    ),
    wau AS (SELECT week, CAST(count(*) AS BIGINT) AS wau FROM wk GROUP BY week)
    SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau,
           CAST((1000 * dau.dau) // wau.wau AS BIGINT) AS stickiness_permille
    FROM dau
    JOIN wau ON wau.week = CAST(date_diff('day', DATE '2024-01-01', dau.day) AS BIGINT) // 7
    ORDER BY day
    """,
)
def q234(spark, sf_dir):
    """DAU/WAU stickiness — the engagement ratio product analytics
    watches daily: exact distinct users per day over exact distinct
    users in that day's (calendar-aligned) week, integer permille.
    Both distincts come from ONE (day, user) dedup pass re-rolled to
    each grain — never two scans of the raw events.

    100 TB shape: the (day, user) dedup is the only row-grain
    aggregate (map-side combine); day and week rollups are bounded-
    domain hash-aggs, and the final join is day-grain x week-grain —
    report-sized. The q174 bitmap/GROUPING SETS form is the
    single-pass variant when even the dedup pass must not repeat."""
    ev = t(spark, sf_dir, "events")
    d = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    d = d.withColumn(
        "week", F.expr("CAST(datediff(day, DATE '2024-01-01') AS BIGINT) DIV 7")
    )
    dau = d.groupBy("day", "week").agg(F.count(F.lit(1)).cast("long").alias("dau"))
    wk = d.select("week", "user_id").distinct()
    wau = wk.groupBy("week").agg(F.count(F.lit(1)).cast("long").alias("wau"))
    return (
        dau.join(F.broadcast(wau), "week")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau", "wau",
            F.expr("CAST((1000 * dau) DIV wau AS BIGINT)").alias("stickiness_permille"),
        )
        .orderBy("day")
    )


# =====================================================================
# q235 — leave-one-out target encoding (leakage-free, integer-exact)
# =====================================================================

@query(
    "q235_loo_target_encoding",
    """
    WITH pts AS (
      SELECT o_orderkey, o_orderpriority AS cat,
             CAST(round(o_totalprice * 100) AS BIGINT) AS y
      FROM orders
    ),
    g AS (
      SELECT cat, CAST(sum(y) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS n
      FROM pts GROUP BY cat
    )
    SELECT p.o_orderkey, p.cat,
           CAST(CASE WHEN g.n > 1 THEN (g.sy - p.y) // (g.n - 1) ELSE 0 END AS BIGINT)
             AS loo_mean_cents
    FROM pts p JOIN g ON g.cat = p.cat
    WHERE p.o_orderkey % 101 = 0
    ORDER BY p.o_orderkey
    """,
)
def q235(spark, sf_dir):
    """Leave-one-out target encoding — the leakage-free categorical
    feature: each row's encoding is its category's mean target
    EXCLUDING the row itself ((sum - y_i) / (n - 1), exact integer
    floor), so the feature never contains the row's own label. One
    per-category aggregate broadcasts back over the scan; singleton
    categories encode 0 (the deterministic fallback a real pipeline
    would blend with a prior).

    100 TB shape: one hash-agg to category grain (tiny — broadcasts),
    one map-side join-and-arithmetic pass over the facts; nothing
    row-grain shuffles twice. The % 101 slice bounds the compared
    output; the encoding itself is computed for every row."""
    pts = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("cat"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("y"),
    )
    g = pts.groupBy("cat").agg(
        F.sum("y").cast("long").alias("sy"), F.count(F.lit(1)).cast("long").alias("n")
    )
    return (
        pts.join(F.broadcast(g), "cat")
        .select(
            "o_orderkey", "cat",
            F.expr(
                "CAST(CASE WHEN n > 1 THEN (sy - y) DIV (n - 1) ELSE 0 END AS BIGINT)"
            ).alias("loo_mean_cents"),
        )
        .filter(F.col("o_orderkey") % 101 == 0)
        .orderBy("o_orderkey")
    )


# =====================================================================
# q236 — centroid-classifier eval: confusion matrix + precision/recall
# =====================================================================

@query(
    "q236_classifier_eval",
    """
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    ep AS (
      SELECT vec_id, label, CAST(i AS INT) AS d, ei[CAST(i AS INT)] AS v
      FROM e, unnest(range(1, 65)) AS u(i)
    ),
    cent AS (
      SELECT label AS clabel, d,
             CAST((sum(v) - ((sum(v) % count(*) + count(*)) % count(*))) // count(*) AS BIGINT) AS c
      FROM ep GROUP BY label, d
    ),
    dist AS (
      SELECT ep.vec_id, ep.label, cent.clabel,
             sum((ep.v - cent.c) * (ep.v - cent.c)) AS dist
      FROM ep JOIN cent ON ep.d = cent.d
      GROUP BY ep.vec_id, ep.label, cent.clabel
    ),
    md AS (SELECT vec_id, min(dist) AS m FROM dist GROUP BY vec_id),
    pred AS (
      SELECT d.vec_id, min(d.label) AS true_label, min(d.clabel) AS pred_label
      FROM dist d JOIN md ON md.vec_id = d.vec_id AND d.dist = md.m
      GROUP BY d.vec_id
    ),
    cm AS (
      SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY true_label, pred_label
    ),
    per AS (
      SELECT cl.label,
             COALESCE((SELECT n FROM cm WHERE true_label = cl.label AND pred_label = cl.label), 0) AS tp,
             COALESCE((SELECT sum(n) FROM cm WHERE pred_label = cl.label), 0) AS pred_n,
             COALESCE((SELECT sum(n) FROM cm WHERE true_label = cl.label), 0) AS true_n
      FROM (SELECT DISTINCT label FROM embeddings) cl
    )
    SELECT label, CAST(tp AS BIGINT) AS tp,
           CAST(pred_n AS BIGINT) AS pred_n, CAST(true_n AS BIGINT) AS true_n,
           CAST(CASE WHEN pred_n > 0 THEN (1000 * tp) // pred_n ELSE 0 END AS BIGINT) AS precision_permille,
           CAST(CASE WHEN true_n > 0 THEN (1000 * tp) // true_n ELSE 0 END AS BIGINT) AS recall_permille
    FROM per ORDER BY label
    """,
)
def q236(spark, sf_dir):
    """Classifier evaluation harness: predict each embedding's label
    with the nearest own-vs-other centroid (q167's integer-exact
    distance machinery, argmin with min-min tie-break), then the
    confusion-matrix rollup — per-class true positives, prediction
    counts, support, precision and recall in integer permille. The
    eval half of every train/serve loop, here with the oracle
    replaying the CLASSIFIER itself, not just the metric arithmetic
    (training-set resubstitution — centroids see all rows; a held-out
    variant splits by q149's hash folds first).

    100 TB shape: identical linear scans as q167 (centroids
    broadcast, per-(vector,label) distance agg), then the confusion
    matrix is a k x k aggregate — report-sized. No pairwise vectors,
    no floats."""
    from .operators.det_hash import quantized_embedding

    emb = t(spark, sf_dir, "embeddings")
    # cache the exploded points once (eager fill): the centroid agg and
    # the distance pass both re-read them (r6 opt, q210's layout)
    ep = (
        emb.select("vec_id", "label", F.posexplode(quantized_embedding("embedding")).alias("d0", "v"))
        .select("vec_id", "label", (F.col("d0") + 1).cast("int").alias("d"), "v")
        .persist()
    )
    ep.count()
    cent = ep.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.expr("CAST((sum(v) - pmod(sum(v), count(*))) DIV count(*) AS BIGINT)").alias("c")
    )
    dist = (
        ep.join(F.broadcast(cent), "d")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist"))
    )
    # argmin as ONE aggregation (the q248/q210 trick): min(struct(dist,
    # clabel)) = smallest distance, ties to the smallest clabel —
    # identical to the old min + join-back + filter + min rule, which
    # evaluated the whole distance subtree twice. `label` is constant
    # per vec_id (the row's true label), so min(label) rides along
    # unchanged.
    pred = (
        dist.groupBy("vec_id")
        .agg(
            F.min(F.struct("dist", "clabel")).alias("__best"),
            F.min("label").alias("true_label"),
        )
        .select("vec_id", "true_label", F.col("__best.clabel").alias("pred_label"))
    )
    # eager checkpoint of the k x k confusion matrix: tp / pred_n /
    # true_n each re-aggregate it, and its lineage contains the whole
    # classifier — 3 consumers x full re-evaluation otherwise
    cm = (
        pred.groupBy("true_label", "pred_label")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    labels = emb.select(F.col("label").alias("lbl")).distinct()
    tp = cm.filter(F.col("true_label") == F.col("pred_label")).select(
        F.col("true_label").alias("lbl"), F.col("n").alias("tp")
    )
    pn = cm.groupBy(F.col("pred_label").alias("lbl")).agg(F.sum("n").alias("pred_n"))
    tn = cm.groupBy(F.col("true_label").alias("lbl")).agg(F.sum("n").alias("true_n"))
    per = (
        labels.join(tp, "lbl", "left").join(pn, "lbl", "left").join(tn, "lbl", "left")
        .select(
            F.col("lbl").alias("label"),
            F.coalesce("tp", F.lit(0)).cast("long").alias("tp"),
            F.coalesce("pred_n", F.lit(0)).cast("long").alias("pred_n"),
            F.coalesce("true_n", F.lit(0)).cast("long").alias("true_n"),
        )
    )
    return per.select(
        "label", "tp", "pred_n", "true_n",
        F.expr("CAST(CASE WHEN pred_n > 0 THEN (1000 * tp) DIV pred_n ELSE 0 END AS BIGINT)").alias("precision_permille"),
        F.expr("CAST(CASE WHEN true_n > 0 THEN (1000 * tp) DIV true_n ELSE 0 END AS BIGINT)").alias("recall_permille"),
    ).orderBy("label")


# =====================================================================
# q237 — k-fold cross-validation of the centroid classifier
# =====================================================================

_CV_K = 3


@query(
    "q237_crossval_accuracy",
    f"""
    WITH e AS (
      SELECT vec_id, label,
             CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % {_CV_K} AS fold,
             list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    ep AS (
      SELECT vec_id, label, fold, CAST(i AS INT) AS d, ei[CAST(i AS INT)] AS v
      FROM e, unnest(range(1, 65)) AS u(i)
    ),
    folds AS (SELECT unnest(range({_CV_K})) AS f),
    cent AS (
      SELECT folds.f, ep.label AS clabel, ep.d,
             CAST((sum(ep.v) - ((sum(ep.v) % count(*) + count(*)) % count(*))) // count(*) AS BIGINT) AS c
      FROM ep, folds WHERE ep.fold <> folds.f
      GROUP BY folds.f, ep.label, ep.d
    ),
    dist AS (
      SELECT ep.vec_id, ep.label, cent.clabel,
             sum((ep.v - cent.c) * (ep.v - cent.c)) AS dist
      FROM ep JOIN cent ON cent.d = ep.d AND cent.f = ep.fold
      GROUP BY ep.vec_id, ep.label, cent.clabel
    ),
    md AS (SELECT vec_id, min(dist) AS m FROM dist GROUP BY vec_id),
    pred AS (
      SELECT d.vec_id, min(d.label) AS true_label, min(d.clabel) AS pred_label
      FROM dist d JOIN md ON md.vec_id = d.vec_id AND d.dist = md.m
      GROUP BY d.vec_id
    )
    SELECT e.fold,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN p.pred_label = p.true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST((1000 * sum(CASE WHEN p.pred_label = p.true_label THEN 1 ELSE 0 END)) // count(*) AS BIGINT)
             AS accuracy_permille
    FROM pred p JOIN e ON e.vec_id = p.vec_id
    GROUP BY e.fold ORDER BY e.fold
    """,
)
def q237(spark, sf_dir):
    """TRUE k-fold cross-validation of the nearest-centroid classifier
    (the held-out counterpart of q236's resubstitution eval): folds
    come from the deterministic md5 hash (q149's split discipline),
    each fold's centroids are trained on the OTHER folds only
    (ep x folds with fold <> f — all k trainings in one aggregation),
    and every vector is scored against its own held-out model. Per-
    fold accuracy in integer permille; the oracle replays folds,
    training, and prediction bit-for-bit.

    100 TB shape: one (fold-crossed) centroid aggregate — k*labels*64
    rows, a broadcast — and the same linear distance aggregation as
    q167/q236 with a k-wide map-side fan-out. Cross-validation costs
    k trainings by CONSTRUCTION; here they share a single shuffle."""
    from .operators.det_hash import quantized_embedding

    emb = t(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label",
        (md5_long(F.col("vec_id").cast("string")) % _CV_K).alias("fold"),
        quantized_embedding("embedding").alias("ei"),
    )
    # cache the exploded points once (eager fill): the fold-crossed
    # centroid training and the distance pass both re-read them (r6
    # opt, the q210/q236 layout)
    ep = (
        e.select("vec_id", "label", "fold", F.posexplode("ei").alias("d0", "v"))
        .select("vec_id", "label", "fold", (F.col("d0") + 1).cast("int").alias("d"), "v")
        .persist()
    )
    ep.count()
    folds = spark.range(_CV_K).select(F.col("id").alias("f"))
    cent = (
        ep.crossJoin(F.broadcast(folds))
        .filter(F.col("fold") != F.col("f"))
        .groupBy("f", F.col("label").alias("clabel"), "d")
        .agg(F.expr("CAST((sum(v) - pmod(sum(v), count(*))) DIV count(*) AS BIGINT)").alias("c"))
    )
    ep_a, cent_a = ep.alias("ep"), cent.alias("ct")
    dist = (
        ep_a.join(
            F.broadcast(cent_a),
            (F.col("ep.d") == F.col("ct.d")) & (F.col("ep.fold") == F.col("ct.f")),
        )
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((F.col("v") - F.col("c")) * (F.col("v") - F.col("c"))).alias("dist"))
    )
    # argmin as ONE aggregation (q236's fix — the old min + join-back
    # evaluated the distance pass twice); the fold rides along as the
    # same md5 expression instead of a join back onto the embeddings
    # scan (identical value by construction)
    pred = (
        dist.groupBy("vec_id")
        .agg(
            F.min(F.struct("dist", "clabel")).alias("__best"),
            F.min("label").alias("true_label"),
        )
        .select("vec_id", "true_label", F.col("__best.clabel").alias("pred_label"))
    )
    return (
        pred.withColumn("fold", md5_long(F.col("vec_id").cast("string")) % _CV_K)
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0))
            .cast("long").alias("n_correct"),
            F.expr(
                "CAST((1000 * sum(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END)) DIV count(*) AS BIGINT)"
            ).alias("accuracy_permille"),
        )
        .orderBy("fold")
    )


# =====================================================================
# q238 — decile gains table (two-pass global ntile over a score)
# =====================================================================

@query(
    "q238_gains_table",
    """
    WITH scored AS (
      SELECT c.c_custkey,
             CAST(round(c.c_acctbal * 100) AS BIGINT) AS score,
             CASE WHEN EXISTS (
               SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
             ) THEN 1 ELSE 0 END AS positive
      FROM customer c
    ),
    ranked AS (
      SELECT c_custkey, score, positive,
             ntile(10) OVER (ORDER BY score DESC, c_custkey) AS decile
      FROM scored
    ),
    agg AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(positive) AS BIGINT) AS n_pos
      FROM ranked GROUP BY decile
    ),
    tot AS (SELECT sum(n_pos) AS p FROM agg)
    SELECT a.decile, a.n, a.n_pos,
           CAST((1000 * a.n_pos) // a.n AS BIGINT) AS rate_permille,
           CAST((1000 * sum(a.n_pos) OVER (ORDER BY a.decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) // t.p AS BIGINT)
             AS cum_capture_permille
    FROM agg a, tot t
    ORDER BY a.decile
    """,
)
def q238(spark, sf_dir):
    """Decile gains table — the targeting-model report: rank customers
    by a score (account balance standing in for a model score), split
    into10 deciles, and show per-decile positive rate plus cumulative
    capture of all positives (how much of the outcome the top-k
    deciles reach). The Spark decile comes from the scale-safe
    two-pass global_ntile (bucket-local ranks + closed-form tile
    arithmetic — plan-gated no single-partition window); the oracle
    uses a plain window. The cumulative pass runs over 10 rows.

    100 TB shape: outcome flags are one semi-join aggregate; the
    ranking is the two-pass operator; everything after is decile
    grain."""
    from pyspark.sql import Window
    from .operators.windows import global_ntile

    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    big = orders.filter(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    scored = (
        cust.join(big.withColumn("__hit", F.lit(1)), "c_custkey", "left")
        .select(
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("score"),
            F.coalesce(F.col("__hit"), F.lit(0)).alias("positive"),
        )
    )
    ranked = global_ntile(
        scored, "score", False,
        [F.col("score").desc(), F.col("c_custkey").asc()], 10, out_col="decile",
    )
    agg = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("positive").cast("long").alias("n_pos"),
    )
    tot = agg.agg(F.sum("n_pos").alias("p"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)  # 10 rows
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("cum_pos", F.sum("n_pos").over(w))
        .select(
            "decile", "n", "n_pos",
            F.expr("CAST((1000 * n_pos) DIV n AS BIGINT)").alias("rate_permille"),
            F.expr("CAST((1000 * cum_pos) DIV p AS BIGINT)").alias("cum_capture_permille"),
        )
        .orderBy("decile")
    )


# =====================================================================
# q239 — per-document keyword extraction (integer TF x floor-log2 IDF)
# =====================================================================

@query(
    "q239_keyword_extraction",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ),
    tf AS (
      SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
      FROM tok WHERE w <> '' GROUP BY doc_id, w
    ),
    df AS (SELECT w, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY w),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.w,
             tf.tf * (CAST(length(bin(nd.n // df.df)) AS BIGINT)) AS score
      FROM tf JOIN df ON df.w = tf.w CROSS JOIN nd
    ),
    ranked AS (
      SELECT doc_id, w, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, w) AS rk
      FROM scored
    )
    SELECT doc_id, w AS keyword, CAST(score AS BIGINT) AS score, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3 AND doc_id % 11 = 0
    ORDER BY doc_id, rk
    """,
)
def q239(spark, sf_dir):
    """Per-document keyword extraction: top-3 terms by integer
    TF x floor-log2(N/df) — the classic TF-IDF ranking with the
    bin()-length log trick (q198's idf discipline), so both engines
    score every term identically at any corpus size. The per-doc
    top-k window is DOC-partitioned (per-key sequences, parallel);
    ties break on the term itself.

    100 TB shape: term frequencies and document frequencies are two
    hash-aggs (map-side combine); the df table joins back keyed on
    the term; N broadcasts as a 1-row scalar. Keyword extraction at
    corpus scale is exactly this shape — no vocabulary ever sits on
    one node. The % 11 slice bounds the compared output."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("w")).filter(F.col("w") != "")
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tf.groupBy("w").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    nd = docs.agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (
        tf.join(df, "w")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id", "w",
            (F.col("tf") * F.length(F.expr("bin(n DIV df)")).cast("long")).alias("score"),
        )
    )
    w_rk = Window.partitionBy("doc_id").orderBy(F.desc("score"), "w")
    return (
        scored.withColumn("rk", F.row_number().over(w_rk).cast("long"))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") % 11 == 0))
        .select("doc_id", F.col("w").alias("keyword"), F.col("score").cast("long").alias("score"), "rk")
        .orderBy("doc_id", "rk")
    )


# =====================================================================
# q240 — daily new-vs-returning user split
# =====================================================================

@query(
    "q240_new_vs_returning",
    """
    WITH d AS (
      SELECT user_id, CAST(ts AS DATE) AS day FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    first_seen AS (SELECT user_id, min(day) AS f FROM d GROUP BY user_id)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(sum(CASE WHEN d.day = fs.f THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN d.day > fs.f THEN 1 ELSE 0 END) AS BIGINT) AS returning_users,
           CAST(sum(sum(CASE WHEN d.day = fs.f THEN 1 ELSE 0 END))
                OVER (ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cumulative_known_users
    FROM d JOIN first_seen fs ON fs.user_id = d.user_id
    GROUP BY d.day
    ORDER BY day
    """,
)
def q240(spark, sf_dir):
    """The daily new-vs-returning headline: each (user, day) active
    pair classifies against the user's first-seen day, and the
    running total of first appearances is the cumulative known-user
    curve. Two user-grain aggregates and a day-grain rollup — the
    growth-accounting primitive under every 'net new users' chart.

    100 TB shape: the (user, day) dedup and first-seen aggregates are
    the only row-grain work (map-side combine, shuffled on user ids);
    the cumulative window runs over DAY grain — bounded domain. The
    join is user-keyed with first_seen tiny relative to activity."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events")
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    fs = d.groupBy("user_id").agg(F.min("day").alias("f"))
    day = (
        d.join(fs, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("f"), 1).otherwise(0)).cast("long").alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("f"), 1).otherwise(0)).cast("long").alias("returning_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)  # day grain: bounded
    return (
        day.withColumn("cumulative_known_users", F.sum("new_users").over(w).cast("long"))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users", "returning_users", "cumulative_known_users",
        )
        .orderBy("day")
    )


# =====================================================================
# q241 — categorical association screen (integer PMI-weighted MI score)
# =====================================================================

@query(
    "q241_feature_association",
    """
    WITH pairs AS (
      SELECT o_orderpriority AS x, o_orderstatus AS y FROM orders
    ),
    nxy AS (SELECT x, y, CAST(count(*) AS BIGINT) AS n_xy FROM pairs GROUP BY x, y),
    nx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM nxy GROUP BY x),
    ny AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM nxy GROUP BY y),
    nn AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM nxy)
    SELECT c.x, c.y, c.n_xy,
           CAST(length(bin(c.n_xy * nn.n)) AS BIGINT)
             - CAST(length(bin(nx.n_x * ny.n_y)) AS BIGINT) AS pmi_log2,
           CAST(c.n_xy * (CAST(length(bin(c.n_xy * nn.n)) AS BIGINT)
                          - CAST(length(bin(nx.n_x * ny.n_y)) AS BIGINT)) AS BIGINT)
             AS mi_contribution
    FROM nxy c JOIN nx ON nx.x = c.x JOIN ny ON ny.y = c.y CROSS JOIN nn
    ORDER BY abs(mi_contribution) DESC, c.x, c.y LIMIT 50
    """,
)
def q241(spark, sf_dir):
    """Categorical-association screen: per (priority, status) cell,
    the integer floor-log2 PMI (the q204 trick at contingency-table
    grain) and its count-weighted mutual-information contribution —
    the feature-relevance check run before one categorical is used to
    predict another (cells with large |contribution| carry the
    dependence). All counts stay bigint; both engines agree
    bit-for-bit at any N.

    100 TB shape: one hash-agg to the contingency table (bounded by
    the category-domain product), marginals re-rolled from the TINY
    cell table, everything after is report-sized."""
    pairs = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("x"), F.col("o_orderstatus").alias("y")
    )
    nxy = pairs.groupBy("x", "y").agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    nx = nxy.groupBy("x").agg(F.sum("n_xy").cast("long").alias("n_x"))
    ny = nxy.groupBy("y").agg(F.sum("n_xy").cast("long").alias("n_y"))
    nn = nxy.agg(F.sum("n_xy").cast("long").alias("n"))
    out = (
        nxy.join(F.broadcast(nx), "x")
        .join(F.broadcast(ny), "y")
        .crossJoin(F.broadcast(nn))
        .select(
            "x", "y", "n_xy",
            (
                F.length(F.expr("bin(n_xy * n)")).cast("long")
                - F.length(F.expr("bin(n_x * n_y)")).cast("long")
            ).alias("pmi_log2"),
        )
        .withColumn("mi_contribution", (F.col("n_xy") * F.col("pmi_log2")).cast("long"))
    )
    return out.orderBy(F.abs(F.col("mi_contribution")).desc(), "x", "y").limit(50)


# =====================================================================
# q242 — header/detail reconciliation (order total vs line items)
# =====================================================================

@query(
    "q242_header_detail_recon",
    """
    WITH detail AS (
      SELECT l_orderkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS line_cents,
             CAST(count(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY l_orderkey
    ),
    recon AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
             COALESCE(d.line_cents, 0) AS line_cents,
             COALESCE(d.n_lines, 0) AS n_lines
      FROM orders o LEFT JOIN detail d ON d.l_orderkey = o.o_orderkey
    ),
    classified AS (
      SELECT *,
             CASE
               WHEN n_lines = 0 THEN 'no_lines'
               WHEN header_cents = line_cents THEN 'exact'
               WHEN abs(header_cents - line_cents) * 100 <= header_cents THEN 'within_1pct'
               WHEN abs(header_cents - line_cents) * 4 <= header_cents THEN 'within_25pct'
               ELSE 'divergent'
             END AS bucket
      FROM recon
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(abs(header_cents - line_cents)) AS BIGINT) AS abs_gap_cents,
           CAST(min(o_orderkey) AS BIGINT) AS sample_orderkey
    FROM classified GROUP BY bucket ORDER BY bucket
    """,
)
def q242(spark, sf_dir):
    """Header/detail reconciliation — the ERP audit: does each order's
    header total match the sum of its line items? Orders bucket into
    exact / within-1% / within-25% / divergent / no-lines via integer
    cross-multiplied tolerance tests (abs(gap)*100 <= header is
    'within 1%' with zero float division), with the total absolute
    gap and a deterministic sample key per bucket. TPC-H totals
    include tax/discount so divergence is EXPECTED — the audit
    quantifies the distribution rather than asserting zero.

    100 TB shape: one detail aggregate shuffled on the order key, one
    key join against headers, one bounded-bucket rollup. The shape
    every financial close process runs nightly."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    detail = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("long").alias("line_cents"),
        F.count(F.lit(1)).cast("long").alias("n_lines"),
    )
    recon = (
        orders.select("o_orderkey", F.round(F.col("o_totalprice") * 100).cast("long").alias("header_cents"))
        .join(detail, "o_orderkey", "left")
        .select(
            "o_orderkey", "header_cents",
            F.coalesce("line_cents", F.lit(0)).cast("long").alias("line_cents"),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        )
    )
    classified = recon.withColumn(
        "bucket",
        F.when(F.col("n_lines") == 0, "no_lines")
        .when(F.col("header_cents") == F.col("line_cents"), "exact")
        .when(F.abs(F.col("header_cents") - F.col("line_cents")) * 100 <= F.col("header_cents"), "within_1pct")
        .when(F.abs(F.col("header_cents") - F.col("line_cents")) * 4 <= F.col("header_cents"), "within_25pct")
        .otherwise("divergent"),
    )
    return (
        classified.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.abs(F.col("header_cents") - F.col("line_cents"))).cast("long").alias("abs_gap_cents"),
            F.min("o_orderkey").cast("long").alias("sample_orderkey"),
        )
        .orderBy("bucket")
    )


# =====================================================================
# q243 — Zipf rank-frequency audit (two-pass global rank over vocab)
# =====================================================================

@query(
    "q243_zipf_audit",
    """
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    ),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM tok WHERE w <> '' GROUP BY w),
    ranked AS (
      SELECT w, f, CAST(row_number() OVER (ORDER BY f DESC, w) AS BIGINT) AS rank
      FROM freq
    )
    SELECT rank, w, f,
           CAST(length(bin(rank)) AS BIGINT) AS log2_rank,
           CAST(length(bin(f)) AS BIGINT) AS log2_freq,
           CAST(rank * f AS BIGINT) AS rank_x_freq
    FROM ranked WHERE rank <= 50
    ORDER BY rank
    """,
)
def q243(spark, sf_dir):
    """Zipf rank-frequency audit of the corpus vocabulary: rank every
    term by frequency and report floor-log2 rank/frequency plus the
    rank x freq product (constant-ish under Zipf's law — drift flags
    synthetic, truncated, or boilerplate-heavy corpora before
    tokenizer training trusts the distribution). The Spark rank is
    the TWO-PASS global_row_number (rank the whole vocabulary with
    no single-partition sort); the oracle uses a plain window.

    100 TB shape: one token hash-agg to vocab grain, then the
    two-pass rank (range-partitioned on frequency, offsets
    broadcast); output is the top of the curve via a pushed rank
    filter."""
    from .operators.windows import global_row_number

    docs = t(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("f"))
    )
    ranked = global_row_number(
        freq, "f", False, [F.col("f").desc(), F.col("w").asc()], out_col="rank"
    )
    return (
        ranked.filter(F.col("rank") <= 50)
        .select(
            "rank", "w", "f",
            F.length(F.expr("bin(rank)")).cast("long").alias("log2_rank"),
            F.length(F.expr("bin(f)")).cast("long").alias("log2_freq"),
            (F.col("rank") * F.col("f")).cast("long").alias("rank_x_freq"),
        )
        .orderBy("rank")
    )


# =====================================================================
# q244 — price-volume-mix revenue bridge (exact integer decomposition)
# =====================================================================

_PVM_SPLIT = "1995-01-01"


@query(
    "q244_revenue_bridge",
    f"""
    WITH per AS (
      SELECT o_orderpriority AS grp,
             CASE WHEN o_orderdate < DATE '{_PVM_SPLIT}' THEN 1 ELSE 2 END AS period,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    s AS (
      SELECT grp,
             CAST(sum(CASE WHEN period = 1 THEN cents ELSE 0 END) AS BIGINT) AS r1,
             CAST(sum(CASE WHEN period = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q1,
             CAST(sum(CASE WHEN period = 2 THEN cents ELSE 0 END) AS BIGINT) AS r2,
             CAST(sum(CASE WHEN period = 2 THEN 1 ELSE 0 END) AS BIGINT) AS q2
      FROM per GROUP BY grp
    )
    SELECT grp, r1, q1, r2, q2,
           r2 - r1 AS delta_cents,
           CAST(CASE WHEN q1 > 0 THEN (r1 * (q2 - q1)) // q1 ELSE 0 END AS BIGINT) AS volume_effect_cents,
           CAST(r2 - r1 - (CASE WHEN q1 > 0 THEN (r1 * (q2 - q1)) // q1 ELSE 0 END) AS BIGINT)
             AS price_mix_effect_cents
    FROM s ORDER BY grp
    """,
)
def q244(spark, sf_dir):
    """Price-volume-mix revenue bridge: per segment, the
    period-over-period revenue delta decomposed into a volume effect
    (old average price x order-count change, exact integer floor) and
    the complementary price/mix effect (delta minus volume — the
    decomposition sums EXACTLY by construction, no float residue).
    The finance waterfall behind every 'why did revenue move' review.

    100 TB shape: one hash-agg computes both periods' sums in a
    single scan (conditional aggregation, map-side combine); the
    bridge arithmetic runs on segment-grain rows. r1*(q2-q1) stays
    far inside bigint at these magnitudes; the DECIMAL(38) upgrade
    (q221) applies verbatim if it ever would not."""
    per = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.when(F.col("o_orderdate") < F.lit(_PVM_SPLIT).cast("date"), 1).otherwise(2).alias("period"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    s = per.groupBy("grp").agg(
        F.sum(F.when(F.col("period") == 1, F.col("cents")).otherwise(0)).cast("long").alias("r1"),
        F.sum(F.when(F.col("period") == 1, 1).otherwise(0)).cast("long").alias("q1"),
        F.sum(F.when(F.col("period") == 2, F.col("cents")).otherwise(0)).cast("long").alias("r2"),
        F.sum(F.when(F.col("period") == 2, 1).otherwise(0)).cast("long").alias("q2"),
    )
    return s.select(
        "grp", "r1", "q1", "r2", "q2",
        (F.col("r2") - F.col("r1")).alias("delta_cents"),
        F.expr("CAST(CASE WHEN q1 > 0 THEN (r1 * (q2 - q1)) DIV q1 ELSE 0 END AS BIGINT)").alias(
            "volume_effect_cents"
        ),
        F.expr(
            "CAST(r2 - r1 - (CASE WHEN q1 > 0 THEN (r1 * (q2 - q1)) DIV q1 ELSE 0 END) AS BIGINT)"
        ).alias("price_mix_effect_cents"),
    ).orderBy("grp")


# =====================================================================
# q245 — one-way ANOVA / eta-squared (exact variance decomposition)
# =====================================================================

@query(
    "q245_variance_decomposition",
    """
    WITH y AS (
      SELECT o_orderpriority AS grp, CAST(round(o_totalprice * 100) AS BIGINT) AS v
      FROM orders
    ),
    g AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS s,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS ss
      FROM y GROUP BY grp
    ),
    tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
             sum(ss) AS ss
      FROM g
    ),
    big AS (
      SELECT
        -- N-scaled sums of squares (exact in HUGEINT):
        --   SST*N = N*sum(v^2) - (sum v)^2
        --   SSB*N = N*sum_g(s_g^2 * N / n_g)/N ... computed as
        --           N * sum_g(s_g^2 // n_g-free form): use exact
        --           per-group s^2*N // n accumulated in HUGEINT
        (SELECT CAST(tot.n AS HUGEINT) * CAST(tot.ss AS HUGEINT)
                - CAST(tot.s AS HUGEINT) * CAST(tot.s AS HUGEINT) FROM tot) AS sst_n,
        (SELECT sum((CAST(g.s AS HUGEINT) * CAST(g.s AS HUGEINT) * CAST(tot.n AS HUGEINT))
                     // CAST(g.n AS HUGEINT)) FROM g, tot) AS ssb_acc,
        (SELECT CAST(tot.s AS HUGEINT) * CAST(tot.s AS HUGEINT) FROM tot) AS s2
    )
    SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
           CAST((SELECT count(*) FROM g) AS BIGINT) AS k,
           CAST((1000 * (ssb_acc - s2)) // sst_n AS BIGINT) AS eta2_permille
    FROM big
    """,
)
def q245(spark, sf_dir):
    """One-way ANOVA effect size (eta-squared): how much of order
    value variance the priority segment explains. Everything is the
    exact N-scaled identity — SST*N = N*Σv² − (Σv)², SSB*N =
    Σ_g(s_g²·N/n_g) − (Σv)² — computed in HUGEINT/DECIMAL(38) (the
    q221 discipline: these cross terms overflow int64 at sf0.1), so
    the permille effect size matches bit-for-bit across engines. Per-group
    quotients exceed int64, so the Spark floor division is the exact
    decimal identity (a - a % b) / b — `div` would silently wrap. The variance
    screen run before trusting a segmentation.

    100 TB shape: ONE hash-agg computes n/Σv/Σv² per group (map-side
    combine); the decomposition runs on k rows. Nothing else scans
    data."""
    y = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("v"),
    )
    g = y.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").cast("long").alias("s"),
        F.sum(F.expr("CAST(v AS DECIMAL(38,0)) * CAST(v AS DECIMAL(38,0))")).alias("ss"),
    )
    tot = g.agg(
        F.sum("n").cast("long").alias("tn"),
        F.sum("s").cast("long").alias("ts"),
        F.sum("ss").cast("decimal(38,0)").alias("tss"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    big = (
        g.crossJoin(F.broadcast(tot))
        .select(
            "tn", "ts", "tss", "k",
            # quotient ~1e24 exceeds int64, so `div` (returns BIGINT)
            # would wrap: exact decimal floor-div = (a - a % b) / b —
            # the division has no remainder, so the decimal result is
            # exact and integral
            F.expr(
                "CAST((CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)) * CAST(tn AS DECIMAL(38,0))"
                " - (CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0)) * CAST(tn AS DECIMAL(38,0)))"
                "   % CAST(n AS DECIMAL(38,0)))"
                " / CAST(n AS DECIMAL(38,0)) AS DECIMAL(38,0))"
            ).alias("ssb_term"),
        )
        .groupBy("tn", "ts", "tss", "k")
        .agg(F.sum("ssb_term").alias("ssb_acc"))
    )
    return big.select(
        F.col("tn").alias("n"),
        "k",
        F.expr(
            "CAST((1000 * (ssb_acc - CAST(ts AS DECIMAL(38,0)) * CAST(ts AS DECIMAL(38,0))))"
            " div (CAST(tn AS DECIMAL(38,0)) * tss"
            "      - CAST(ts AS DECIMAL(38,0)) * CAST(ts AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("eta2_permille"),
    )


# =====================================================================
# q246 — k-anonymity audit over quasi-identifiers
# =====================================================================

_KANON_K = 5


@query(
    "q246_k_anonymity",
    f"""
    WITH qi AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(round(c_acctbal * 100) AS BIGINT) // 100000 AS bal_band,
             CAST(count(*) AS BIGINT) AS class_size
      FROM customer GROUP BY 1, 2, 3
    )
    SELECT CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN class_size < {_KANON_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_risky_classes,
           CAST(sum(CASE WHEN class_size < {_KANON_K} THEN class_size ELSE 0 END) AS BIGINT) AS n_risky_rows,
           CAST(min(class_size) AS BIGINT) AS k_actual,
           CAST(sum(CASE WHEN class_size = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_rows
    FROM qi
    """,
)
def q246(spark, sf_dir):
    """k-anonymity audit: group rows by their quasi-identifier tuple
    (nation, segment, $1000 balance band) and measure the equivalence
    -class size distribution — the actual k, how many classes and
    rows fall under the target k=5, and how many rows are
    UNIQUE on the quasi-identifiers (directly re-identifiable). The
    privacy gate run before sharing 'anonymized' extracts; shrinking
    n_risky_rows is what generalization/suppression iterates on.

    100 TB shape: one hash-agg to equivalence-class grain, one
    bounded rollup — the audit costs a groupBy regardless of table
    size. Banding is integer floor division (no float binning)."""
    qi = (
        t(spark, sf_dir, "customer")
        .groupBy(
            "c_nationkey", "c_mktsegment",
            F.expr("CAST(round(c_acctbal * 100) AS BIGINT) DIV 100000").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("class_size"))
    )
    return qi.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(F.when(F.col("class_size") < _KANON_K, 1).otherwise(0)).cast("long").alias("n_risky_classes"),
        F.sum(F.when(F.col("class_size") < _KANON_K, F.col("class_size")).otherwise(0)).cast("long").alias("n_risky_rows"),
        F.min("class_size").cast("long").alias("k_actual"),
        F.sum(F.when(F.col("class_size") == 1, 1).otherwise(0)).cast("long").alias("n_unique_rows"),
    )
