"""Training-data curation operators: PII scrubbing, benchmark
contamination, repetition signals, deterministic stratified sampling,
int8-quantized similarity, char-bigram fluency scoring, and the
end-to-end keep/drop pipeline that composes them.

These extend the §2.10 north-star family (SURVEY.md) with the filters a
large-scale LLM training-data pipeline runs between ingest and dedup
(C4/Gopher/RefinedWeb-style rule stages). Reference parity: the
reference's data plane (patterns/node/node.py Table ops) carries these
as user-level SQL/Python nodes; here they are first-class operators.

Design rules (same as operators/det_hash.py):
- hot paths are built-in column expressions (whole-stage codegen) or
  integer-keyed equi-joins — no Python in the per-row path;
- every decision that feeds the oracle gate is integer arithmetic or a
  single IEEE op sequence both engines execute identically, so each
  operator is fully hash-checkable by DuckDB;
- regexes stay inside the Java∩RE2 common subset (no lookaround, no
  backrefs) so Spark and DuckDB match identically.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .det_hash import md5_long
from .text import tokens

# Java-and-RE2-compatible PII patterns (no lookaround / backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"

# (pattern, replacement) in application order: email first (it can
# contain dots/digits), then ipv4 (dots) before phone (dashes only) —
# the same order is baked into the oracle SQL.
PII_RULES: list[tuple[str, str]] = [
    (EMAIL_RE, "[EMAIL]"),
    (IPV4_RE, "[IP]"),
    (PHONE_RE, "[PHONE]"),
]


def pii_scrub(df: DataFrame, text_col: str = "text", out_col: str = "redacted") -> DataFrame:
    """Adds per-row PII hit counts and the redacted text.

    Columns: n_emails, n_ipv4, n_phones (long), `out_col` (redacted
    text). Pure regexp expressions — codegen'd, scales as one scan.
    Spark's regexp_replace replaces ALL matches (DuckDB needs the 'g'
    flag; the oracle emitters add it)."""
    c = F.col(text_col)
    out = df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)).cast("long"))
    out = out.withColumn("n_ipv4", F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), 0)).cast("long"))
    out = out.withColumn("n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0)).cast("long"))
    red = c
    for pat, repl in PII_RULES:
        red = F.regexp_replace(red, pat, repl)
    return out.withColumn(out_col, red)


def contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus doc, how many of
    its DISTINCT word n-grams appear anywhere in the benchmark set
    (decontamination is a standard pre-training stage: drop or flag
    training docs that overlap eval benchmarks).

    Output: (id, n_grams, n_overlap, overlap_ratio). Shape: both sides
    shingle (explode + distinct), join on a 60-bit md5 gram hash — an
    inverted-index equi-join keyed on longs, never doc×doc pairs; the
    benchmark side is the small side (broadcastable). overlap_ratio is
    one integer division rounded to 6dp, so the oracle matches bitwise."""
    from .det_hash import distinct_shingles

    c_sh = distinct_shingles(corpus, id_col, text_col, n).select(
        "id", md5_long("sh").alias("h")
    )
    b_sh = (
        distinct_shingles(benchmark, id_col, text_col, n)
        .select(md5_long("sh").alias("h"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = c_sh.join(F.broadcast(b_sh), "h", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_overlap"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_overlap").cast("long").alias("n_overlap"),
            F.round(F.col("n_overlap").cast("double") / F.col("n_grams"), 6).alias("overlap_ratio"),
        )
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals: duplicate-word
    fraction and top-bigram fraction (high values flag boilerplate /
    spam for the quality filter).

    Output: (id, n_tokens, n_distinct_tokens, n_bigrams,
    top_bigram_count, dup_word_ratio, top_bigram_ratio). Docs with <2
    tokens are excluded (no bigrams). All counts are integers; the two
    ratios are single divisions rounded to 6dp. Shape: one explode +
    two hash aggregations keyed on (id, bigram) then id — scales like
    shingling, no joins."""
    src = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("toks")).filter(
        F.size("toks") >= 2
    )
    pos = src.select(
        "id",
        F.size("toks").alias("n_tokens"),
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks") - F.lit(1))).alias("i"),
    )
    bigrams = pos.select(
        "id",
        "n_tokens",
        F.lower(F.concat_ws(" ", F.slice("toks", F.col("i"), 2))).alias("bg"),
        F.lower(F.element_at("toks", F.col("i"))).alias("w"),
    )
    per_bg = bigrams.groupBy("id", "bg").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("bg_count"),
        # distinct first-words contributing to this bigram are counted
        # globally below via a separate token pass
    )
    stats = per_bg.groupBy("id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.sum("bg_count").alias("n_bigrams"),
        F.max("bg_count").alias("top_bigram_count"),
    )
    tok_stats = (
        df.select(F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("w"))
        .select("id", F.lower("w").alias("w"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_tok_all"), F.countDistinct("w").alias("n_distinct_tokens"))
    )
    return (
        stats.join(tok_stats, "id")
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_distinct_tokens").cast("long").alias("n_distinct_tokens"),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("top_bigram_count").cast("long").alias("top_bigram_count"),
            F.round(
                F.lit(1.0) - F.col("n_distinct_tokens").cast("double") / F.col("n_tokens"), 6
            ).alias("dup_word_ratio"),
            F.round(
                F.col("top_bigram_count").cast("double") / F.col("n_bigrams"), 6
            ).alias("top_bigram_ratio"),
        )
    )


DEFAULT_STRATA_PCT: dict[str, int] = {"en": 60, "de": 30, "fr": 15, "es": 5}


def stratified_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    pct: dict[str, int] | None = None,
    default_pct: int = 10,
) -> DataFrame:
    """Deterministic hash-based stratified sampling: keep a row iff
    md5(id) mod 100 < pct[stratum]. Rebalancing corpora by language /
    source is a standard mixture-construction step; hashing the id (not
    an RNG) makes the sample reproducible across engines, runs, and
    retries — the property seeded TABLESAMPLE (q60) cannot give.

    Output: sampled rows (id, stratum, bucket). Map-side only: one scan,
    no shuffle."""
    pct = DEFAULT_STRATA_PCT if pct is None else pct
    bucket = md5_long(F.col(id_col).cast("string")) % F.lit(100)
    rate = F.coalesce(
        *[
            F.when(F.col(strata_col) == k, F.lit(v))
            for k, v in sorted(pct.items())
        ],
        F.lit(default_pct),
    )
    return (
        df.withColumn("bucket", bucket.cast("long"))
        .filter(F.col("bucket") < rate)
        .select(F.col(id_col), F.col(strata_col), F.col("bucket"))
    )


def stratified_sample_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    strata_col: str = "lang",
    pct: dict[str, int] | None = None,
    default_pct: int = 10,
) -> str:
    """DuckDB SQL replaying stratified_sample bit-for-bit (same md5
    bucket, same per-stratum rates)."""
    pct = DEFAULT_STRATA_PCT if pct is None else pct
    cases = " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(pct.items()))
    return f"""
    SELECT {id_col}, {strata_col},
           CAST(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS BIGINT) AS bucket
    FROM {table}
    WHERE CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 15) AS BIGINT) % 100
          < (CASE {strata_col} {cases} ELSE {default_pct} END)
    """


# ---------------------------------------------------------------------
# Int8-quantized similarity (the bandwidth/memory scale path)
# ---------------------------------------------------------------------

def quantize_int8(vec_col: str | Column, scale: int = 127) -> Column:
    """Symmetric int8 quantization q = clip(round(x*scale), -scale,
    scale) as array<long>. 4× memory/bandwidth reduction per float32
    dim; at 100 TB the candidate scan is bandwidth-bound, so this is
    the practical storage format for first-pass retrieval."""
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(
        c,
        lambda x: F.least(
            F.greatest(F.round(x.cast("double") * scale).cast("long"), F.lit(-scale)), F.lit(scale)
        ),
    )


def int8_cosine_topk(
    candidates: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k over int8-quantized vectors: integer dot products
    and integer squared norms; cosine = dot / sqrt(na*nb) — ONE sqrt +
    ONE division over exact integers, so Spark and DuckDB produce
    bit-identical doubles and the ranking is oracle-checkable.

    Shape: same as q37 (broadcast queries × candidate scan, map-side
    only, per-query top-k window) but the arithmetic is int64 on int8
    values — the form a bandwidth-bound 100 TB scan wants."""
    qv = queries.select(
        F.col(id_col).alias("query_id"), quantize_int8(vec_col).alias("qa")
    )
    cv = candidates.select(
        F.col(id_col).alias("neighbor_id"), quantize_int8(vec_col).alias("ca")
    )
    dot = F.aggregate(
        F.zip_with("qa", "ca", lambda a, b: a * b), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    nq = F.aggregate(F.col("qa"), F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    nc = F.aggregate(F.col("ca"), F.lit(0).cast("long"), lambda acc, x: acc + x * x)
    scored = (
        F.broadcast(qv)
        .crossJoin(cv)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot.alias("dot_int"),
            nq.alias("nq"),
            nc.alias("nc"),
        )
        .select(
            "query_id",
            "neighbor_id",
            "dot_int",
            (F.col("dot_int").cast("double") / F.sqrt((F.col("nq") * F.col("nc")).cast("double"))).alias("cos_q"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_int").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "dot_int",
            F.round("cos_q", 6).alias("cos_q"),
        )
    )


def int8_cosine_oracle_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    dim: int = 64,
    scale: int = 127,
) -> str:
    """DuckDB SQL replaying int8_cosine_topk exactly (same clip/round
    quantizer, integer dot, identical IEEE op sequence for cos_q).
    NOTE: ranking is on the INTEGER dot product (neighbor_id tiebreak),
    so no float comparison ever decides a row's presence."""
    return f"""
    WITH e AS (
      SELECT {id_col} AS id,
             list_transform({vec_col}::DOUBLE[],
                            x -> greatest(least(CAST(round(x * {scale}, 0) AS BIGINT), {scale}), -{scale})) AS q
      FROM {table}
    ),
    scored AS (
      SELECT qe.id AS query_id, ce.id AS neighbor_id,
             list_sum(list_transform(range(1, {dim + 1}), i -> qe.q[CAST(i AS INT)] * ce.q[CAST(i AS INT)])) AS dot_int,
             list_sum(list_transform(range(1, {dim + 1}), i -> qe.q[CAST(i AS INT)] * qe.q[CAST(i AS INT)])) AS nq,
             list_sum(list_transform(range(1, {dim + 1}), i -> ce.q[CAST(i AS INT)] * ce.q[CAST(i AS INT)])) AS nc
      FROM e qe JOIN e ce ON qe.id <> ce.id
      WHERE qe.id IN (SELECT {id_col} FROM {table} WHERE {query_pred})
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, CAST(dot_int AS BIGINT) AS dot_int,
           round(CAST(dot_int AS DOUBLE) / sqrt(CAST(nq * nc AS DOUBLE)), 6) AS cos_q
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY dot_int DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------
# Char-bigram corpus-frequency fluency score
# ---------------------------------------------------------------------

def bigram_lm_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Corpus-frequency fluency proxy: build the corpus char-bigram
    frequency table, then score each doc by the average corpus
    frequency of its bigrams (duplicates counted). A cheap stand-in
    for LM-perplexity filtering (low avg frequency = unusual byte
    sequences = likely noise) with the same dataflow shape: global
    model aggregate -> broadcast -> per-doc rescan.

    Output: (id, n_bigrams, sum_freq, avg_freq). sum_freq is an exact
    integer; avg_freq one division rounded 6dp. Shape: one explode,
    one small groupBy (bigram vocabulary), broadcast join back, one
    per-id aggregation — two scans of the exploded grams, no O(N²)."""
    pos = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.sequence(F.lit(1), F.length(text_col) - F.lit(1))).alias("i"),
        F.col(text_col).alias("__t"),
    ).filter(F.length("__t") >= 2)
    # persist + EAGER fill: the gram stream feeds the frequency agg AND
    # the score join-back; a lazy persist lets those concurrent
    # consumer stages race to fill the cache, each computing its own
    # explode (r6 opt, same fix as the dedup/minhash operators)
    grams = pos.select("id", F.col("__t").substr(F.col("i"), F.lit(2)).alias("bg")).persist()
    grams.count()
    freq = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("freq"))
    out = (
        grams.join(F.broadcast(freq), "bg")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_bigrams"), F.sum("freq").alias("sum_freq"))
        .select(
            F.col("id").alias(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("sum_freq").cast("long").alias("sum_freq"),
            F.round(F.col("sum_freq").cast("double") / F.col("n_bigrams"), 6).alias("avg_freq"),
        )
    )
    return out


BIGRAM_LM_ORACLE = """
    WITH pos AS (
      SELECT {id_col} AS id, substr({text_col}, CAST(i AS INT), 2) AS bg
      FROM {table}, unnest(range(1, length({text_col}))) AS u(i)
      WHERE length({text_col}) >= 2
    ),
    freq AS (SELECT bg, count(*) AS freq FROM pos GROUP BY bg)
    SELECT pos.id AS {id_col},
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(freq.freq) AS BIGINT) AS sum_freq,
           round(CAST(sum(freq.freq) AS DOUBLE) / count(*), 6) AS avg_freq
    FROM pos JOIN freq ON pos.bg = freq.bg
    GROUP BY pos.id
"""


# ---------------------------------------------------------------------
# Keep/drop curation pipeline (the capstone composition)
# ---------------------------------------------------------------------

def curation_verdict(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 25,
    min_quality: float = 0.5,
) -> DataFrame:
    """End-to-end filter decision per document, composing exact dedup +
    length + quality into a single verdict with a deterministic reason
    priority (dup > too_short > low_quality > keep) — the judgment a
    curation pipeline materializes before writing the training split.

    Dedup winner = smallest id per md5 fingerprint (same rule as
    operators/dedup.exact). Output: (id, verdict). Shape: one window
    over fingerprint (single hash shuffle) + closed-form quality
    expressions; scales like exact dedup."""
    from .text import fingerprint, quality_score

    scored = quality_score(fingerprint(df, text_col), text_col)
    w = Window.partitionBy("fingerprint")
    scored = scored.withColumn("__min_id", F.min(id_col).over(w))
    verdict = (
        F.when(F.col(id_col) != F.col("__min_id"), F.lit("dup"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
        .otherwise(F.lit("keep"))
    )
    return scored.select(F.col(id_col), verdict.alias("verdict"))


def curation_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 25,
    min_quality: float = 0.5,
) -> str:
    """DuckDB SQL replaying curation_verdict: same fingerprint
    normalization, same quality formula as q70's oracle, same reason
    priority."""
    return f"""
    WITH s AS (
      SELECT {id_col} AS id,
             md5(lower(regexp_replace(trim({text_col}), '\\s+', ' ', 'g'))) AS fp,
             len(string_split_regex(trim({text_col}), '\\s+')) AS n_words,
             round(cast(len(list_filter(string_split_regex(trim({text_col}), '\\s+'),
                       x -> list_contains(['the','a','an','and','or','of','to','in','is','it'], lower(x)))) AS double)
                   / greatest(len(string_split_regex(trim({text_col}), '\\s+')), 1), 6) AS stopword_ratio
      FROM {table}
    ),
    q AS (
      SELECT id, fp, n_words,
             round(0.7 * least(cast(n_words AS double) / 50.0, 1.0)
                 + 0.3 * least(stopword_ratio * 5.0, 1.0), 6) AS quality_score,
             min(id) OVER (PARTITION BY fp) AS min_id
      FROM s
    )
    SELECT id AS {id_col},
           CASE WHEN id <> min_id THEN 'dup'
                WHEN n_words < {min_words} THEN 'too_short'
                WHEN quality_score < {min_quality} THEN 'low_quality'
                ELSE 'keep' END AS verdict
    FROM q
    """


def strip_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    text_col: str = "text",
    line_sep: str = " <br> ",
    min_df: int = 2,
    df_frac: int = 10,
) -> DataFrame:
    """Per-source line-frequency boilerplate removal — the CCNet /
    RefinedWeb curation staple: a LINE that recurs across many
    documents of the same source (nav bars, cookie banners, footers)
    is template markup, not content; strip it everywhere.

    A line is boilerplate in source s when it appears (exactly) in at
    least max(min_df, docs(s) DIV df_frac) distinct documents of s —
    the threshold scales with the source (an absolute cap is a latent
    off-switch, SCALE.md §65). Returns one row per document:
    (id, n_lines, n_kept_lines, clean_text) with clean_text the
    kept lines rejoined in order (empty string when every line was
    template).

    100 TB shape: one posexplode over documents; line df is a
    (source, line-hash) aggregation; the boiler set joins back by
    equi-join (per-source boiler sets are small — that's the premise
    of templates); ordered rebuild is a per-doc sort_array over kept
    (pos, line) structs. No window over the corpus, no Python."""
    lines = df.select(
        F.col(id_col).alias("__id"),
        F.col(source_col).alias("__src"),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("__pos", "__line"),
    )
    src_docs = df.groupBy(F.col(source_col).alias("__src")).agg(
        F.count(F.lit(1)).cast("long").alias("__nd")
    )
    lfreq = lines.groupBy("__src", "__line").agg(
        F.countDistinct("__id").cast("long").alias("__df")
    )
    boiler = (
        lfreq.join(src_docs, "__src")
        .filter(
            F.col("__df")
            >= F.greatest(F.lit(min_df).cast("long"), F.expr(f"__nd DIV {df_frac}"))
        )
        .select("__src", F.col("__line").alias("__bline"))
    )
    kept = lines.join(
        boiler,
        (lines["__src"] == boiler["__src"]) & (lines["__line"] == boiler["__bline"]),
        "left_anti",
    )
    totals = lines.groupBy("__id").agg(F.count(F.lit(1)).cast("long").alias("n_lines"))
    rebuilt = kept.groupBy("__id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept_lines"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            " ",
        ).alias("clean_text"),
    )
    return (
        totals.join(rebuilt, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            "n_lines",
            F.coalesce("n_kept_lines", F.lit(0)).cast("long").alias("n_kept_lines"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )
