"""Analytics extensions round 2b: entity resolution, span-level dedup,
feature hashing, integer-exact outlier detection, sequence mining, and
native argmin/argmax — each oracle-paired under the driver gate.

Reference parity: these extend the enrichment/curation surface of
patterns-devkit (reference patterns/node.py documents the table/stream
SDK; the analytics ops are SURVEY.md §2.10 north-star extensions a
training-data pipeline needs on top of it).

Cross-engine determinism rules (see queries.py docstring + det_hash.py):
integer quantization before any comparison that picks winners, decimal/
HUGEINT for products that exceed int64, md5-based hashing only, unique
tie-break keys in every argmax.
"""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .operators import windows
from .operators.det_hash import _SHINGLE_SQL, distinct_shingles, md5_long
from .operators.text import tokens
from .queries import query, t

# =====================================================================
# q90 — fuzzy entity matching (blocked Levenshtein self-join)
# =====================================================================


@query(
    "q90_fuzzy_match",
    """
    WITH p AS (
      SELECT p_partkey, p_name, split_part(p_name, ' ', 2) AS noun FROM part
    ),
    pairs AS (
      SELECT a.noun, levenshtein(a.p_name, b.p_name) AS dist
      FROM p a JOIN p b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 3
    )
    SELECT noun,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(dist) AS BIGINT) AS sum_dist,
           CAST(min(dist) AS BIGINT) AS min_dist
    FROM pairs GROUP BY noun
    """,
)
def q90(spark, sf_dir):
    """Entity resolution: candidate pairs from a blocking key (the noun
    token of the two-word part name), scored by Levenshtein distance on
    the full name — the classic blocked fuzzy join. Scale shape: the
    row-level self-join is O(sum(block^2)) in *rows*, so distances are
    computed only between DISTINCT names (a vocabulary-sized table) and
    row-pair counts recovered by multiplying name multiplicities —
    same-name pairs contribute C(cnt,2) at distance 0, cross-name
    pairs cnt_a*cnt_b at their name distance. Identical output to the
    naive row-level form (the oracle SQL), ~2500x less Levenshtein
    work on this fixture (measured 37.7s -> sub-second at sf0.1), and
    at 100 TB the compare cost is bounded by vocabulary size, not
    corpus size."""
    p = t(spark, sf_dir, "part").select(
        "p_name", F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun")
    )
    g = p.groupBy("p_name", "noun").agg(F.count(F.lit(1)).alias("cnt"))
    same = (
        g.filter(F.col("cnt") >= 2)
        .groupBy("noun")
        .agg(
            F.sum(F.expr("cnt * (cnt - 1) DIV 2")).alias("n_pairs"),
            F.lit(0).cast("long").alias("sum_dist"),
            F.lit(0).cast("long").alias("min_dist"),
        )
    )
    a, b = g.alias("a"), g.alias("b")
    cross = (
        a.join(b, (F.col("a.noun") == F.col("b.noun")) & (F.col("a.p_name") < F.col("b.p_name")))
        .select(
            F.col("a.noun").alias("noun"),
            (F.col("a.cnt") * F.col("b.cnt")).alias("mult"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 3)
        .groupBy("noun")
        .agg(
            F.sum("mult").alias("n_pairs"),
            F.sum(F.col("dist") * F.col("mult")).alias("sum_dist"),
            F.min("dist").cast("long").alias("min_dist"),
        )
    )
    return (
        same.unionByName(cross)
        .groupBy("noun")
        .agg(
            F.sum("n_pairs").cast("long").alias("n_pairs"),
            F.sum("sum_dist").cast("long").alias("sum_dist"),
            F.min("min_dist").cast("long").alias("min_dist"),
        )
    )


# =====================================================================
# q91 — span-level (k-word window) duplication profile
# =====================================================================

_SPAN_N = 8


@query(
    "q91_span_dedup",
    f"""
    WITH {_SHINGLE_SQL.format(id_col="doc_id", text_col="text", table="documents",
                              n=_SPAN_N, n_minus_1=_SPAN_N - 1, n_minus_2=_SPAN_N - 2)},
    shared AS (
      SELECT sh FROM sh GROUP BY sh HAVING count(DISTINCT id) >= 2
    ),
    per_doc AS (
      SELECT sh.id,
             count(*) AS n_windows,
             count(*) FILTER (WHERE shared.sh IS NOT NULL) AS n_dup
      FROM sh LEFT JOIN shared ON sh.sh = shared.sh
      GROUP BY sh.id
    )
    SELECT d.source,
           CAST(sum(n_windows) AS BIGINT) AS n_windows,
           CAST(sum(n_dup) AS BIGINT) AS n_dup_windows,
           CAST((1000 * sum(n_dup)) // sum(n_windows) AS BIGINT) AS dup_permille
    FROM per_doc JOIN documents d ON d.doc_id = per_doc.id
    GROUP BY d.source
    """,
)
def q91(spark, sf_dir):
    """Span-level duplication profile: fraction of each source's
    distinct {_SPAN_N}-word windows that also appear in another
    document — the measurement pass behind substring-level corpus
    dedup (windows shared across docs are the spans an exact-substring
    deduper would cut). Built on the same explode-positions shingle
    pattern as MinHash (det_hash.distinct_shingles), with the window
    strings xxhash64'd BEFORE the dedup exchange (hashed=True): every
    shuffle — the distinct, the shared-window agg, the join-back —
    keys on 8-byte longs instead of the ~50-byte 8-word string (guide
    §2.3; grouping the strings moves ~9x the bytes). The DuckDB oracle
    keeps the string form — only equality is ever tested, so results
    are identical (a 64-bit collision needs ~2^32 distinct windows;
    the q63 inverted-index join documents the same accepted trade).
    Dup ratio is emitted as integer permille (DIV) to avoid float
    division drift."""
    docs = t(spark, sf_dir, "documents")
    # persist + EAGER fill: the shingle set feeds the shared-window agg
    # AND the join-back probe; without the cache (or with a lazy one —
    # concurrent consumer stages race to fill it, each computing its
    # own copy) the tokenize/explode/distinct subtree executes twice
    # per run (same fix as q189 — a count WINDOW over sh would
    # evaluate it once without a cache, but pays a full sort shuffle
    # of the shingle keys, measured slower than caching + the
    # broadcast join this form keeps)
    sh = distinct_shingles(docs, "doc_id", "text", _SPAN_N, hashed=True).persist()
    sh.count()
    shared = sh.groupBy("sh").agg(F.countDistinct("id").alias("nd")).filter(F.col("nd") >= 2).select("sh")
    per_doc = (
        sh.join(shared.withColumn("__shared", F.lit(1)), "sh", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.when(F.col("__shared").isNotNull(), 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        per_doc.join(docs.select(F.col("doc_id").alias("id"), "source"), "id")
        .groupBy("source")
        .agg(
            F.sum("n_windows").cast("long").alias("n_windows"),
            F.sum("n_dup").cast("long").alias("n_dup_windows"),
            F.expr("CAST((1000 * sum(n_dup)) DIV sum(n_windows) AS BIGINT)").alias("dup_permille"),
        )
    )


# =====================================================================
# q92 — feature hashing (hashing trick) over document tokens
# =====================================================================

_FH_BUCKETS = 64


@query(
    "q92_feature_hashing",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents
    ),
    b AS (
      SELECT doc_id, tok,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % {_FH_BUCKETS} AS bucket
      FROM toks
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM b GROUP BY bucket
    """,
)
def q92(spark, sf_dir):
    """Feature hashing (the hashing trick): token -> md5-derived bucket
    in [0, {_FH_BUCKETS}), corpus-wide occurrence/vocabulary/document
    counts per bucket — the fixed-width sparse featurization used for
    hashed bag-of-words models. One explode + one hash-agg shuffle on
    the bucket key; the md5 base hash is the det_hash.md5_long
    cross-engine primitive, so bucket membership is bit-identical in
    the oracle. At scale the same plan holds: bucket cardinality is
    constant, so the final agg is tiny regardless of corpus size."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens("text")).alias("tok"))
    b = toks.select("doc_id", "tok", (md5_long("tok") % _FH_BUCKETS).alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
        F.countDistinct("tok").cast("long").alias("n_distinct_tokens"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )


# =====================================================================
# q93 — integer-exact z-score outlier detection
# =====================================================================


@query(
    "q93_zscore_outliers",
    """
    WITH e AS (
      SELECT event_type, event_id, CAST(round(value * 1000000) AS BIGINT) AS v FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(v) AS HUGEINT) AS s,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
      FROM e GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(any_value(n) AS BIGINT) AS n,
           CAST(sum(CASE WHEN (n * v - s) * (n * v - s) > 9 * (n * q - s * s) THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(sum(CASE WHEN (n * v - s) * (n * v - s) > 9 * (n * q - s * s) THEN event_id ELSE 0 END) AS BIGINT) AS outlier_id_sum
    FROM e JOIN stats ON e.event_type = stats.event_type
    GROUP BY e.event_type
    """,
)
def q93(spark, sf_dir):
    """Outlier detection with an integer-exact z-score test: flag
    events with |value - mean| > 3*stddev per event type, evaluated as
    (n*v - S)^2 > 9*(n*Q - S^2) over micro-quantized values — the
    float test multiplied through by n^2 so no IEEE division/sqrt can
    flip a verdict across engines (Spark decimal(38,0) == DuckDB
    HUGEINT; products stay < 1e27 at any plausible per-group n). Plan:
    one stats aggregate, broadcast back onto the scan, one final
    aggregate — two shuffles on event_type, scan-proportional work.
    At extreme per-group cardinality (n*Q approaching 1e38) the same
    pipeline degrades gracefully to the double-precision z-score; the
    exact form is what the cross-engine gate requires."""
    e = t(spark, sf_dir, "events").select(
        "event_type", "event_id", F.round(F.col("value") * 1000000).cast("long").alias("v")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    stats = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(d("v")).cast("decimal(38,0)").alias("s"),
        F.sum(d("v") * d("v")).cast("decimal(38,0)").alias("q"),
    )
    j = e.join(F.broadcast(stats), "event_type")
    lhs = (F.col("n") * d("v") - F.col("s"))
    outlier = (lhs * lhs) > (F.lit(9).cast("decimal(38,0)") * (F.col("n") * F.col("q") - F.col("s") * F.col("s")))
    return j.groupBy("event_type").agg(
        F.any_value(F.col("n")).cast("long").alias("n"),
        F.sum(F.when(outlier, 1).otherwise(0)).cast("long").alias("n_outliers"),
        F.sum(F.when(outlier, F.col("event_id")).otherwise(0)).cast("long").alias("outlier_id_sum"),
    )


# =====================================================================
# q94 — per-user event-sequence mining (regex over ordered journeys)
# =====================================================================


@query(
    "q94_sequence_mining",
    """
    WITH seqs AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_events,
             string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(CASE WHEN regexp_matches(seq, 'view.*click.*purchase') THEN 1 ELSE 0 END AS BIGINT) AS has_funnel,
           CAST(len(regexp_extract_all(seq, 'click,purchase')) AS BIGINT) AS n_click_to_purchase
    FROM seqs
    """,
)
def q94(spark, sf_dir):
    """Sequence mining: each user's journey as an ordered event-type
    string, then regex features over it — ordered-funnel presence
    (view -> click -> purchase with anything between) and the count of
    immediate click->purchase transitions. The sequence is built from a
    sort_array(collect_list(struct(ts, event_id, ...))) aggregate —
    event_id makes the order total, so the string is deterministic; the
    regex features are then embarrassingly parallel. Scale: one shuffle
    on user_id; per-user sequences are bounded by per-user activity
    (the same contract any session-analytics engine requires)."""
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    seqs = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda s: s["event_type"],
            ),
            ",",
        ).alias("seq"),
    )
    return seqs.select(
        "user_id",
        "n_events",
        F.when(F.col("seq").rlike("view.*click.*purchase"), 1).otherwise(0).cast("long").alias("has_funnel"),
        F.size(F.regexp_extract_all(F.col("seq"), F.lit("click,purchase"), F.lit(0))).cast("long").alias("n_click_to_purchase"),
    )


# =====================================================================
# q95 — native argmin/argmax aggregates with total-order keys
# =====================================================================


@query(
    "q95_argmax",
    """
    SELECT o_orderpriority,
           arg_max(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey) AS most_expensive_order,
           arg_min(o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 + o_orderkey) AS cheapest_order,
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def q95(spark, sf_dir):
    """Native argmin/argmax (Spark max_by/min_by == DuckDB arg_max/
    arg_min) with a total-order key: cents * 1e6 + orderkey, so ties in
    price can't make the winner engine-dependent (both engines document
    arbitrary tie winners). Single hash aggregate, map-side partial —
    the cheapest possible plan for a per-group winner, vs. the
    window-row_number form (q82) which pays a sort."""
    o = t(spark, sf_dir, "orders")
    key = F.round(F.col("o_totalprice") * 100).cast("long") * 1000000 + F.col("o_orderkey")
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", key).alias("most_expensive_order"),
        F.min_by("o_orderkey", key).alias("cheapest_order"),
        F.max(F.round(F.col("o_totalprice") * 100).cast("long")).alias("max_cents"),
    )


# =====================================================================
# q96 — winnowing fingerprints (local-min k-gram selection)
# =====================================================================

_WN_K = 5   # k-gram width (words)
_WN_W = 4   # winnowing window (consecutive k-grams)


@query(
    "q96_winnowing",
    f"""
    WITH toks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    pos AS (
      SELECT id, CAST(i AS BIGINT) AS i,
             array_to_string(w[CAST(i AS BIGINT):CAST(i + {_WN_K - 1} AS BIGINT)], ' ') AS kg
      FROM toks, unnest(range(1, greatest(len(w) - {_WN_K - 2}, 1))) AS u(i)
      WHERE len(w) >= {_WN_K}
    ),
    h AS (
      SELECT id, i, CAST('0x' || substr(md5(kg), 1, 15) AS BIGINT) % {1 << 40} AS h FROM pos
    ),
    mk AS (
      SELECT id,
             min(h * {1 << 20} + (i - 1)) OVER (
               PARTITION BY id ORDER BY i
               ROWS BETWEEN CURRENT ROW AND {_WN_W - 1} FOLLOWING) AS mk
      FROM h
    )
    SELECT id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_kgrams,
           CAST(count(DISTINCT mk) AS BIGINT) AS n_fingerprints,
           CAST(sum(DISTINCT mk // {1 << 20}) AS BIGINT) AS fp_hash_sum
    FROM mk GROUP BY id
    """,
)
def q96(spark, sf_dir):
    """Winnowing document fingerprints (the MOSS selection rule): hash
    every {_WN_K}-word k-gram, then in each window of {_WN_W}
    consecutive k-grams keep the minimum hash (position as tie-break),
    dedup the selections — a guaranteed-coverage O(1/w)-density
    fingerprint set for substring-level plagiarism/dup detection,
    complementing q68's bottom-k (global sample) with positional
    coverage. Plan: explode-positions k-grams (codegen'd slice+concat,
    no interpreted higher-order fns), one window over (doc, position),
    one aggregate — shuffles only on doc_id. Hash = det_hash md5 folded
    to 40 bits, combined key h*2^20+pos stays < 2^60, so the DuckDB
    oracle replays selection bit-identically; fp_hash_sum sums the
    DISTINCT selected hash values (both engines dedup on the projected
    expression)."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(F.col("doc_id").alias("id"), tokens("text").alias("w")).filter(
        F.size("w") >= _WN_K
    )
    pos = toks.select(
        "id", "w", F.explode(F.sequence(F.lit(1), F.size("w") - F.lit(_WN_K - 1))).alias("i")
    )
    kg = pos.select(
        "id", F.col("i").cast("long").alias("i"),
        F.concat_ws(" ", F.slice("w", F.col("i"), _WN_K)).alias("kg"),
    )
    h = kg.select("id", "i", (md5_long("kg") % F.lit(1 << 40)).alias("h"))
    win = Window.partitionBy("id").orderBy("i").rowsBetween(0, _WN_W - 1)
    mk = h.select("id", F.min(F.col("h") * F.lit(1 << 20) + (F.col("i") - 1)).over(win).alias("mk"))
    return mk.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_kgrams"),
        F.countDistinct("mk").cast("long").alias("n_fingerprints"),
        F.expr(f"CAST(sum(DISTINCT mk DIV {1 << 20}) AS BIGINT)").alias("fp_hash_sum"),
    )


# =====================================================================
# q97 — unpivot / melt (wide metrics -> long rows)
# =====================================================================


@query(
    "q97_unpivot",
    """
    WITH agg AS (
      SELECT o_orderpriority,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS max_cents
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'sum_cents' AS metric, sum_cents AS metric_value FROM agg
    UNION ALL
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS metric_value FROM agg
    UNION ALL
    SELECT o_orderpriority, 'max_cents' AS metric, max_cents AS metric_value FROM agg
    """,
)
def q97(spark, sf_dir):
    """Unpivot/melt: wide per-group metric columns to long
    (group, metric, value) rows via the native DataFrame unpivot
    operator (Spark's UNPIVOT == the oracle's UNION ALL expansion —
    the portable ANSI form). Metrics are exact cents-bigints so the
    melted value column is a single comparable type. One aggregate
    then a zero-shuffle generate — unpivot is map-side."""
    o = t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    agg = o.groupBy("o_orderpriority").agg(
        F.sum(cents).alias("sum_cents"),
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.max(cents).alias("max_cents"),
    )
    return agg.unpivot(
        ["o_orderpriority"], ["sum_cents", "n_orders", "max_cents"], "metric", "metric_value"
    )


# =====================================================================
# q98 — error-safe casts (try_cast) over semi-structured input
# =====================================================================


@query(
    "q98_try_cast",
    """
    WITH raw AS (
      SELECT event_type,
             CASE WHEN event_type = 'error' THEN 'N/A'
                  ELSE json_extract_string(props, '$.k') END AS k_raw
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) FILTER (WHERE TRY_CAST(k_raw AS BIGINT) IS NULL) AS BIGINT) AS n_unparseable,
           CAST(sum(coalesce(TRY_CAST(k_raw AS BIGINT), 0)) AS BIGINT) AS parsed_sum
    FROM raw GROUP BY event_type
    """,
)
def q98(spark, sf_dir):
    """Error-safe casting (try_cast): parse a semi-structured string
    field where some rows are garbage — malformed rows become NULL
    instead of failing the job, the ingest-hardening idiom for dirty
    corpora. The fixture's props are all clean, so the 'error' rows
    are masked to a non-numeric sentinel to exercise the failure path
    deterministically on both engines (only clean integer strings are
    parsed: engines disagree on decimal strings, e.g. DuckDB rounds
    '1.5' while Spark rejects it — a documented cross-engine trap).
    Plan: single hash aggregate over a codegen'd projection."""
    e = t(spark, sf_dir, "events")
    raw = e.select(
        "event_type",
        F.when(F.col("event_type") == "error", F.lit("N/A"))
        .otherwise(F.get_json_object("props", "$.k"))
        .alias("k_raw"),
    )
    parsed = F.expr("try_cast(k_raw AS BIGINT)")
    return raw.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(parsed.isNull(), 1).otherwise(0)).cast("long").alias("n_unparseable"),
        F.sum(F.coalesce(parsed, F.lit(0))).cast("long").alias("parsed_sum"),
    )


# =====================================================================
# q99 — quantified subqueries (ALL / ANY)
# =====================================================================


@query(
    "q99_quantified_subquery",
    """
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(count(*) FILTER (
             WHERE c_acctbal > ALL (SELECT c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY')
           ) AS BIGINT) AS n_above_all_machinery,
           CAST(count(*) FILTER (
             WHERE c_acctbal > ANY (SELECT c_acctbal FROM customer WHERE c_mktsegment = 'MACHINERY')
           ) AS BIGINT) AS n_above_some_machinery
    FROM customer GROUP BY c_mktsegment
    """,
)
def q99(spark, sf_dir):
    """Quantified subqueries: `> ALL (...)` / `> ANY (...)` against a
    reference population. Spark SQL has no quantified comparison
    syntax, so the Spark plan uses the standard decorrelation — ALL
    becomes > max(sub), ANY becomes > min(sub), each a 1-row aggregate
    broadcast into the predicate (exactly what a SQL optimizer lowers
    the quantifiers to when the subquery is non-null and non-empty;
    acctbal comparisons are done in exact cents). Scale: the reference
    population reduces to one row before it ever meets the big side."""
    c = t(spark, sf_dir, "customer").select(
        "c_mktsegment", F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents")
    )
    m = c.filter(F.col("c_mktsegment") == "MACHINERY").agg(
        F.max("bal_cents").alias("mx"), F.min("bal_cents").alias("mn")
    )
    j = c.join(F.broadcast(m))
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum(F.when(F.col("bal_cents") > F.col("mx"), 1).otherwise(0)).cast("long").alias("n_above_all_machinery"),
        F.sum(F.when(F.col("bal_cents") > F.col("mn"), 1).otherwise(0)).cast("long").alias("n_above_some_machinery"),
    )


# =====================================================================
# q100 — robust outliers: median absolute deviation (integer-exact)
# =====================================================================


@query(
    "q100_mad_outliers",
    """
    WITH e AS (
      SELECT event_type, event_id, CAST(round(value * 1000000) AS BIGINT) AS v FROM events
    ),
    ranked AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM e
    ),
    med AS (
      SELECT event_type, v AS med_v FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT e.event_type, abs(e.v - med.med_v) AS d, med.med_v
      FROM e JOIN med ON e.event_type = med.event_type
    ),
    dranked AS (
      SELECT event_type, d, med_v,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM dev
    ),
    mad AS (
      SELECT event_type, med_v, d AS mad_v FROM dranked WHERE rn = (n + 1) // 2
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(any_value(mad.med_v) AS BIGINT) AS median_micros,
           CAST(any_value(mad.mad_v) AS BIGINT) AS mad_micros,
           CAST(sum(CASE WHEN abs(e.v - mad.med_v) > 3 * mad.mad_v THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN mad ON e.event_type = mad.event_type
    GROUP BY e.event_type
    """,
)
def q100(spark, sf_dir):
    """Robust outlier detection via median absolute deviation: flag
    events with |v - median| > 3*MAD per type — the heavy-tail-safe
    complement to q93's moment-based z-score (one wild value shifts a
    mean, not a median). Median = the lower median (element at rank
    (n+1) DIV 2), exact on micro-quantized integers, so both engines
    select the identical element with no interpolation; MAD is the
    same selection over absolute deviations. Plan: two window+filter
    rounds (each one shuffle on event_type) + a broadcast of the 5-row
    med/MAD table back onto the scan. At 100 TB exact per-group
    medians are a sort per group — the documented scale relaxation is
    approx_percentile, traded off in SCALE.md; the exact form is what
    the cross-engine gate demands."""
    e = t(spark, sf_dir, "events").select(
        "event_type", "event_id", F.round(F.col("value") * 1000000).cast("long").alias("v")
    )

    def lower_median(df, col, part="event_type"):
        w = Window.partitionBy(part).orderBy(col)
        wn = Window.partitionBy(part)
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(wn))
            .filter(F.col("__rn") == F.expr("(__n + 1) DIV 2"))
        )

    med = lower_median(e, "v").select("event_type", F.col("v").alias("med_v"))
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", "med_v", F.abs(F.col("v") - F.col("med_v")).alias("d")
    )
    mad = lower_median(dev, "d").select("event_type", "med_v", F.col("d").alias("mad_v"))
    j = e.join(F.broadcast(mad), "event_type")
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.any_value(F.col("med_v")).cast("long").alias("median_micros"),
        F.any_value(F.col("mad_v")).cast("long").alias("mad_micros"),
        F.sum(F.when(F.abs(F.col("v") - F.col("med_v")) > 3 * F.col("mad_v"), 1).otherwise(0))
        .cast("long")
        .alias("n_outliers"),
    )


# =====================================================================
# q101 — k-anonymity audit over quasi-identifiers
# =====================================================================

_K_ANON = 10


@query(
    "q101_k_anonymity",
    f"""
    WITH g AS (
      SELECT c_mktsegment, c_nationkey, count(*) AS grp_n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(count(*) FILTER (WHERE grp_n < {_K_ANON}) AS BIGINT) AS n_small_groups,
           CAST(coalesce(sum(grp_n) FILTER (WHERE grp_n < {_K_ANON}), 0) AS BIGINT) AS n_rows_at_risk
    FROM g GROUP BY c_mktsegment
    """,
)
def q101(spark, sf_dir):
    """k-anonymity audit: group by the quasi-identifier tuple
    (segment, nation) and count equivalence classes smaller than
    k={_K_ANON} — rows in those classes are re-identifiable and must be
    suppressed or generalized before a corpus ships (the structured
    complement of q72's free-text PII scrub). Two nested hash
    aggregates on progressively smaller keys — the 100 TB cost is one
    shuffle of group counts, never of rows."""
    c = t(spark, sf_dir, "customer")
    g = c.groupBy("c_mktsegment", "c_nationkey").agg(F.count(F.lit(1)).alias("grp_n"))
    small = F.col("grp_n") < _K_ANON
    return g.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(small, 1).otherwise(0)).cast("long").alias("n_small_groups"),
        F.coalesce(F.sum(F.when(small, F.col("grp_n"))), F.lit(0)).cast("long").alias("n_rows_at_risk"),
    )


# =====================================================================
# q102 — column profiling (the ANALYZE primitive)
# =====================================================================


@query(
    "q102_profile",
    """
    SELECT 'o_orderstatus' AS column_name,
           CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(min(o_orderstatus) AS VARCHAR) AS min_value,
           CAST(max(o_orderstatus) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_custkey',
           CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents',
           CAST(count(*) - count(o_totalprice) AS BIGINT),
           CAST(count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
    FROM orders
    """,
)
def q102(spark, sf_dir):
    """Column profiling (the ANALYZE/data-quality primitive): null
    count, exact distinct count, min/max per audited column, emitted
    as one row per column — the first pass any ingest pipeline runs
    over a new corpus. Numeric min/max are serialized as strings so
    the melted profile is one uniform schema (floats profiled in exact
    cents). Each column is an independent aggregate over the same
    scan; Spark computes them in one pass per column group — at scale
    you profile in one multi-aggregate pass and accept approximate
    distincts (HLL), the exact form here is the oracle-checkable one."""
    o = t(spark, sf_dir, "orders")

    def prof(col, name, expr=None):
        c = expr if expr is not None else F.col(col)
        return o.agg(
            F.lit(name).alias("column_name"),
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias("n_nulls"),
            F.countDistinct(c).cast("long").alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
        )

    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    parts = [
        prof("o_orderstatus", "o_orderstatus"),
        prof("o_orderpriority", "o_orderpriority"),
        prof("o_custkey", "o_custkey"),
        prof(None, "o_totalprice_cents", cents),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# =====================================================================
# q103 — RFM segmentation (recency / frequency / monetary quintiles)
# =====================================================================


@query(
    "q103_rfm",
    """
    WITH p AS (
      SELECT user_id,
             max(ts) AS last_ts,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    scored AS (
      SELECT user_id, freq, monetary_cents,
             CAST(ntile(5) OVER (ORDER BY last_ts DESC, user_id) AS BIGINT) AS r,
             CAST(ntile(5) OVER (ORDER BY freq DESC, user_id) AS BIGINT) AS f,
             CAST(ntile(5) OVER (ORDER BY monetary_cents DESC, user_id) AS BIGINT) AS m
      FROM p
    )
    SELECT user_id, freq, monetary_cents, r, f, m,
           CAST(r * 100 + f * 10 + m AS BIGINT) AS rfm_code
    FROM scored
    """,
)
def q103(spark, sf_dir):
    """RFM segmentation: per-user recency/frequency/monetary quintiles
    over purchase events, composed into the classic 3-digit RFM code —
    the marketing-analytics workhorse. Every ntile rides a total order
    (metric DESC, user_id ASC) so bucket assignment is engine-
    independent; money in exact cents. Scale form: each ntile is a
    two-pass range-partitioned rank (operators/windows.global_ntile)
    instead of a single-partition global sort — three parallel window
    shuffles over the already-reduced user-grain table, exact for any
    bucket boundaries (plan-gated)."""
    e = t(spark, sf_dir, "events")
    p = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("monetary_cents"),
        )
        .withColumn("last_us", F.unix_micros("last_ts"))
    )
    scored = windows.global_ntile(
        p, "last_us", False,
        [F.col("last_us").desc(), F.col("user_id").asc()], 5, out_col="r",
    )
    scored = windows.global_ntile(
        scored, "freq", False,
        [F.col("freq").desc(), F.col("user_id").asc()], 5, out_col="f",
    )
    scored = windows.global_ntile(
        scored, "monetary_cents", False,
        [F.col("monetary_cents").desc(), F.col("user_id").asc()], 5, out_col="m",
    )
    return scored.select(
        "user_id", "freq", "monetary_cents", "r", "f", "m",
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).cast("long").alias("rfm_code"),
    )


# =====================================================================
# q104 — CDC latest-snapshot-per-key (compaction of an append log)
# =====================================================================


@query(
    "q104_latest_per_key",
    """
    WITH ranked AS (
      SELECT o_custkey, o_orderkey, o_orderdate, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey AS latest_orderkey, cents AS latest_cents
    FROM ranked WHERE rn = 1
    """,
)
def q104(spark, sf_dir):
    """Latest-record-per-key: collapse an append log to each key's most
    recent row (the CDC snapshot-compaction primitive behind upsert
    materialization; order made total with the unique orderkey as
    tie-break). One shuffle on the key; at scale this is the window
    whose sort AQE handles per-partition — and when the log is the
    engine's own append table, Table.upsert is the incremental form of
    the same semantics."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("latest_orderkey"), F.col("cents").alias("latest_cents"))
    )


# =====================================================================
# q105 — percent-of-total shares (integer permille, no float division)
# =====================================================================


@query(
    "q105_share_of_total",
    """
    WITH seg AS (
      SELECT c_mktsegment, CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents,
             CAST(count(*) AS BIGINT) AS n_customers
      FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, bal_cents, n_customers,
           CAST((1000 * bal_cents) // sum(bal_cents) OVER () AS BIGINT) AS bal_permille,
           CAST((1000 * n_customers) // sum(n_customers) OVER () AS BIGINT) AS cust_permille
    FROM seg
    """,
)
def q105(spark, sf_dir):
    """Percent-of-total (ratio_to_report): each segment's share of
    positive balances and of customers, as integer permille — the
    windowed-total pattern with DIV instead of float division so both
    engines emit identical shares. The unpartitioned window sum runs
    over the ALREADY-AGGREGATED 5-row table (a single-partition
    exchange of 5 rows, not of the scan), which is the correct scale
    shape for global-share reports."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    seg = c.groupBy("c_mktsegment").agg(
        F.sum(F.round(F.col("c_acctbal") * 100).cast("long")).alias("bal_cents"),
        F.count(F.lit(1)).cast("long").alias("n_customers"),
    )
    w = Window.partitionBy()
    return seg.select(
        "c_mktsegment",
        "bal_cents",
        "n_customers",
        F.expr("CAST((1000 * bal_cents) DIV (sum(bal_cents) OVER ()) AS BIGINT)").alias("bal_permille"),
        F.expr("CAST((1000 * n_customers) DIV (sum(n_customers) OVER ()) AS BIGINT)").alias("cust_permille"),
    )


# =====================================================================
# q106 — near-dup candidate verification (LSH generate -> edit-distance check)
# =====================================================================

from .operators.det_hash import minhash_lsh_pairs_det, minhash_oracle_sql  # noqa: E402

_VERIFY_MIN_AGREE = 8


@query(
    "q106_dedup_verify",
    f"""
    SELECT b.id_a, b.id_b, b.n_sig_agree,
           CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev
    FROM ({minhash_oracle_sql()}) b
    JOIN documents da ON da.doc_id = b.id_a
    JOIN documents db ON db.doc_id = b.id_b
    WHERE b.n_sig_agree >= {_VERIFY_MIN_AGREE}
    """,
)
def q106(spark, sf_dir):
    """The generate-then-verify shape of production dedup: cheap LSH
    candidates (deterministic MinHash banding, q35's operator) verified
    by an expensive exact measure (Levenshtein on the full text) ONLY
    on candidate pairs — never all-pairs. Signature agreement >=
    {_VERIFY_MIN_AGREE}/32 gates which candidates pay the edit
    distance. At 100 TB the verify stage touches O(candidates), and
    the candidate count is controlled by the banding parameters — this
    pipeline IS the scale contract, and the oracle replays both stages
    (hash family + verification) bit-identically."""
    docs = t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs_det(docs).filter(F.col("n_sig_agree") >= _VERIFY_MIN_AGREE)
    ta = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("__ta"))
    tb = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("__tb"))
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .select(
            "id_a", "id_b", "n_sig_agree",
            F.levenshtein(F.col("__ta"), F.col("__tb")).cast("long").alias("lev"),
        )
    )


# =====================================================================
# q107 — rollup with GROUPING() labels (subtotal row identification)
# =====================================================================


@query(
    "q107_grouping_id",
    """
    SELECT coalesce(o_orderstatus, '<all>') AS status,
           coalesce(o_orderpriority, '<all>') AS priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q107(spark, sf_dir):
    """ROLLUP with GROUPING() labels: subtotal rows carry an explicit
    flag per dimension, so '<all>' placeholders are distinguishable
    from a genuine NULL group value — the piece of the grouping-sets
    surface q12/q13/q27 didn't exercise. Same single-shuffle expand
    plan as any rollup."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_priority"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            "n",
        )
    )


# =====================================================================
# q108 — document chunking (overlapping token windows for training/RAG)
# =====================================================================

_CH_SIZE = 32     # tokens per chunk
_CH_STRIDE = 24   # stride (overlap = size - stride = 8)


@query(
    "q108_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             CAST((i - 1) // {_CH_STRIDE} AS BIGINT) AS chunk_index,
             array_to_string(w[CAST(i AS BIGINT):CAST(i + {_CH_SIZE - 1} AS BIGINT)], ' ') AS chunk_text,
             CAST(least(len(w) - i + 1, {_CH_SIZE}) AS BIGINT) AS n_tokens
      FROM toks, unnest(range(1, len(w) + 1, {_CH_STRIDE})) AS u(i)
    )
    SELECT doc_id, chunk_index, chunk_text, n_tokens FROM chunks
    """,
)
def q108(spark, sf_dir):
    """Document chunking: overlapping {_CH_SIZE}-token windows at
    stride {_CH_STRIDE} (8-token overlap), the splitter every
    training-data / retrieval pipeline runs before tokenization.
    Explode-positions + slice/concat (codegen'd; same dataflow as the
    shingle family) — map-side only, zero shuffles: chunking is
    embarrassingly parallel and the plan shows it. Tail chunks carry
    their true (shorter) token count."""
    docs = t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens("text").alias("w"))
    pos = toks.select(
        "doc_id", "w",
        F.explode(F.sequence(F.lit(1), F.size("w"), F.lit(_CH_STRIDE))).alias("i"),
    )
    return pos.select(
        "doc_id",
        F.expr(f"CAST((i - 1) DIV {_CH_STRIDE} AS BIGINT)").alias("chunk_index"),
        F.concat_ws(" ", F.slice("w", F.col("i"), _CH_SIZE)).alias("chunk_text"),
        F.least(F.size("w") - F.col("i") + 1, F.lit(_CH_SIZE)).cast("long").alias("n_tokens"),
    )


# =====================================================================
# q109 — sequence packing (greedy doc -> fixed-token-budget packs)
# =====================================================================

_PACK_BUDGET = 256


@query(
    "q109_sequence_packing",
    f"""
    WITH lens AS (
      SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tok AS prev_cum
      FROM lens
    )
    SELECT CAST(prev_cum // {_PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM cum GROUP BY pack_id
    """,
)
def q109(spark, sf_dir):
    """Sequence packing: assign docs (in doc_id order) to fixed
    token-budget packs of {_PACK_BUDGET} by integer-dividing the
    running token total — the deterministic offset-based packing that
    turns short documents into dense training sequences (a doc
    straddling a boundary spills into the earlier pack; no doc is
    split). Scale form: the running token total is a two-pass
    range-partitioned prefix sum (operators/windows.global_prefix_sum:
    per-range subtotals broadcast back as offsets) over (doc_id,
    n_tok) pairs — no single-partition sort anywhere (plan-gated)."""
    docs = t(spark, sf_dir, "documents")
    lens = docs.select("doc_id", F.size(tokens("text")).cast("long").alias("n_tok"))
    cum = windows.global_prefix_sum(
        lens, "doc_id", True, [F.col("doc_id").asc()], "n_tok", out_col="__cum"
    ).select(
        "doc_id", "n_tok", (F.col("__cum") - F.col("n_tok")).alias("prev_cum")
    )
    return cum.groupBy(F.expr(f"CAST(prev_cum DIV {_PACK_BUDGET} AS BIGINT)").alias("pack_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("first_doc"),
        F.max("doc_id").cast("long").alias("last_doc"),
    )


# =====================================================================
# q110 — contingency table with integer expected counts
# =====================================================================


@query(
    "q110_contingency",
    """
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) + 1 AS BIGINT) AS dow, CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY event_type, dow
    ),
    tot AS (
      SELECT event_type, dow, obs,
             sum(obs) OVER (PARTITION BY event_type) AS row_tot,
             sum(obs) OVER (PARTITION BY dow) AS col_tot,
             sum(obs) OVER () AS n
      FROM cells
    )
    SELECT event_type, dow, obs,
           CAST((1000 * row_tot * col_tot) // (n * n) * n // 1000 AS BIGINT) AS exp_floor,
           CAST((1000 * row_tot * col_tot) // n AS BIGINT) AS exp_milli,
           CAST(abs(1000 * obs - (1000 * row_tot * col_tot) // n) AS BIGINT) AS dev_milli
    FROM tot
    """,
)
def q110(spark, sf_dir):
    """Contingency audit (event type x weekday): observed vs expected-
    under-independence cell counts, with expected values in exact
    milli-units ((1000*row_tot*col_tot) DIV n) so the deviation that
    feeds a chi-square decision is integer-deterministic across
    engines. The window sums run over the ALREADY-AGGREGATED cell
    table (35 rows), not the scan — the same reduced-then-window shape
    as q105. Cross-engine trap handled: Spark dayofweek is 1-based
    Sunday-first, DuckDB's is 0-based — the oracle adds 1."""
    e = t(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type", F.dayofweek("ts").cast("long").alias("dow")
    ).agg(F.count(F.lit(1)).cast("long").alias("obs"))
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("dow")
    wn = Window.partitionBy()
    tot = cells.select(
        "event_type", "dow", "obs",
        F.sum("obs").over(wr).alias("row_tot"),
        F.sum("obs").over(wc).alias("col_tot"),
        F.sum("obs").over(wn).alias("n"),
    )
    return tot.select(
        "event_type", "dow", "obs",
        F.expr("CAST((1000 * row_tot * col_tot) DIV (n * n) * n DIV 1000 AS BIGINT)").alias("exp_floor"),
        F.expr("CAST((1000 * row_tot * col_tot) DIV n AS BIGINT)").alias("exp_milli"),
        F.expr("CAST(abs(1000 * obs - (1000 * row_tot * col_tot) DIV n) AS BIGINT)").alias("dev_milli"),
    )


# =====================================================================
# q111 — normalization-collision dedup (canonicalize then re-fingerprint)
# =====================================================================


@query(
    "q111_normalize_dedup",
    """
    WITH norm AS (
      SELECT doc_id, source,
             md5(text) AS raw_fp,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_fp
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT raw_fp) AS BIGINT) AS n_raw_distinct,
           CAST(count(DISTINCT norm_fp) AS BIGINT) AS n_norm_distinct,
           CAST(count(DISTINCT raw_fp) - count(DISTINCT norm_fp) AS BIGINT) AS n_norm_collisions
    FROM norm GROUP BY source
    """,
)
def q111(spark, sf_dir):
    """Canonicalize-then-dedup: lowercase, strip non-alphanumerics,
    collapse whitespace, re-fingerprint — the normalization pass that
    catches near-identical docs exact dedup misses (case/punctuation
    variants). Reports per-source distinct-fingerprint counts before
    and after normalization; the difference is the normalization-only
    duplicate mass. All regex stays in the Java-regex/RE2 common
    subset (explicit character classes); one hash-aggregate shuffle.
    Note Spark's regexp_replace is global by default == DuckDB's 'g'
    flag."""
    docs = t(spark, sf_dir, "documents")
    norm_text = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " ")
    )
    n = docs.select(
        "source",
        F.md5("text").alias("raw_fp"),
        F.md5(norm_text).alias("norm_fp"),
    )
    return n.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("raw_fp").cast("long").alias("n_raw_distinct"),
        F.countDistinct("norm_fp").cast("long").alias("n_norm_distinct"),
        (F.countDistinct("raw_fp") - F.countDistinct("norm_fp")).cast("long").alias("n_norm_collisions"),
    )


# =====================================================================
# q112 — as-of join with a tolerance bound (bounded lookback)
# =====================================================================

from .operators import asof as asof_ops  # noqa: E402


@query(
    "q112_asof_tolerance",
    """
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT v.event_id FROM events v
             WHERE v.user_id = p.user_id AND v.event_type = 'view'
               AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR
             ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS asof_event_id
    FROM events p WHERE p.event_type = 'purchase'
    """,
)
def q112(spark, sf_dir):
    """As-of join with a 1-hour lookback bound: each purchase matched
    to the user's most recent view AT MOST an hour older (stale
    attributions null out — merge_asof's `tolerance`). Same
    single-shuffle union-window plan as q32 plus one codegen'd
    predicate; the oracle's correlated subquery carries the same range
    bound. Matching semantics note: bounding the most-recent match is
    equivalent to most-recent-within-window, since anything older than
    the newest match is further outside the window."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    return asof_ops.asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["event_id"],
        tiebreak="event_id",
        tolerance="1 hour",
    )


# =====================================================================
# sdk07 — compaction maintenance op on the engine write path
# =====================================================================

from .queries import _temp_engine  # noqa: E402


@query(
    "sdk07_compact",
    """
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 100 < 40
    """,
)
def sdk07(spark, sf_dir):
    """Table.compact as a benched engine op: four buffered-append
    flushes accrete four files; compact() rewrites them as one
    coalesced version (no shuffle) and flips the pointer. The oracle
    checks the data survives byte-identically; the bench number is the
    cost of OPTIMIZE on a hot append table."""
    from .node.node import Table

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    with eng.node_context("w", outputs={"out": "o_compact"}):
        tbl = Table("out", "w")
        for lo, hi in ((0, 10), (10, 20), (20, 30), (30, 40)):
            tbl.append(o.filter((F.col("o_orderkey") % 100 >= lo) & (F.col("o_orderkey") % 100 < hi)))
            tbl.flush()
        tbl.compact(target_files=1)
    with eng.node_context("r", inputs={"in": "o_compact"}):
        return Table("in", "r").read_spark()


# =====================================================================
# q113 — equal-weight touch attribution within a lookback window
# =====================================================================


@query(
    "q113_attribution",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events
    ),
    w AS (
      SELECT event_id, event_type,
             sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY es
               RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_touches
      FROM e
    )
    SELECT event_id,
           CAST(n_touches AS BIGINT) AS n_touches,
           CAST(CASE WHEN n_touches > 0 THEN 1000 // n_touches ELSE 0 END AS BIGINT) AS credit_permille
    FROM w WHERE event_type = 'purchase'
    """,
)
def q113(spark, sf_dir):
    """Multi-touch attribution: each purchase splits credit equally
    (integer permille) across the user's views in the preceding hour —
    a RANGE frame over epoch seconds, so simultaneous events are
    handled by VALUE, not row order (tie-proof across engines). One
    shuffle on user_id; the lookback horizon bounds per-row frame
    state exactly like a stream watermark would."""
    e = t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.unix_timestamp("ts").cast("long").alias("es")
    )
    w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-3600, 0)
    touched = e.select(
        "event_id",
        "event_type",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w).alias("n_touches"),
    )
    return touched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("n_touches").cast("long").alias("n_touches"),
        F.when(F.col("n_touches") > 0, F.expr("CAST(1000 DIV n_touches AS BIGINT)"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("credit_permille"),
    )
