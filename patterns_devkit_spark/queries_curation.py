"""Curation-stage query battery (q72-q78): PII scrubbing, benchmark
decontamination, repetition signals, deterministic stratified
sampling, int8-quantized similarity, char-bigram fluency scoring, and
the composed keep/drop pipeline. Registered into the same QUERIES/
ORACLES registry; same determinism rules as queries.py (integer
decisions, single-IEEE-op value columns, Java∩RE2 regexes)."""
from __future__ import annotations

from pyspark.sql import functions as F

from .operators import curation as cur_ops
from .queries import query, t

# Deterministic synthetic-PII injection (both engines build the same
# string, so the scrub result is oracle-checkable): every doc gets an
# email, an IPv4, and a phone number derived from its id.
_PII_SPARK = lambda: F.concat(  # noqa: E731
    F.lit("contact user"),
    F.col("doc_id").cast("string"),
    F.lit("@example.com via 10.0."),
    (F.col("doc_id") % 256).cast("string"),
    F.lit("."),
    (F.col("doc_id") % 100).cast("string"),
    F.lit(" tel 415-555-"),
    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    F.lit(" "),
    F.col("text"),
)

_PII_SQL = (
    "'contact user' || CAST(doc_id AS VARCHAR) || '@example.com via 10.0.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) || "
    "' tel 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text"
)


@query(
    "q72_pii_scrub",
    f"""
    WITH d AS (SELECT doc_id, {_PII_SQL} AS t FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{cur_ops.EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '{cur_ops.IPV4_RE}')) AS BIGINT) AS n_ipv4,
           CAST(len(regexp_extract_all(t, '{cur_ops.PHONE_RE}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(t,
               '{cur_ops.EMAIL_RE}', '[EMAIL]', 'g'),
               '{cur_ops.IPV4_RE}', '[IP]', 'g'),
               '{cur_ops.PHONE_RE}', '[PHONE]', 'g')) AS redacted_md5,
           CAST(length(regexp_replace(regexp_replace(regexp_replace(t,
               '{cur_ops.EMAIL_RE}', '[EMAIL]', 'g'),
               '{cur_ops.IPV4_RE}', '[IP]', 'g'),
               '{cur_ops.PHONE_RE}', '[PHONE]', 'g')) AS BIGINT) AS n_chars_redacted
    FROM d
    """,
)
def q72(spark, sf_dir):
    """PII detection + redaction (emails / IPv4 / phone numbers): the
    synthetic PII is injected deterministically from doc_id on BOTH
    engines, then operators/curation.pii_scrub removes it — hit counts
    and the md5 of the redacted text are hash-checked. Pure regexp
    column expressions; one scan, no shuffle."""
    d = t(spark, sf_dir, "documents").select("doc_id", _PII_SPARK().alias("text"))
    red = cur_ops.pii_scrub(d, "text", out_col="redacted")
    return red.select(
        "doc_id",
        "n_emails",
        "n_ipv4",
        "n_phones",
        F.md5("redacted").alias("redacted_md5"),
        F.length("redacted").cast("long").alias("n_chars_redacted"),
    )


@query(
    "q73_contamination",
    """
    WITH ctoks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE source <> 'src0'
    ),
    csh AS (
      SELECT DISTINCT id, array_to_string(w[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ') AS sh
      FROM ctoks, unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
      WHERE len(w) >= 3
    ),
    btoks AS (
      SELECT doc_id AS id, string_split_regex(trim(text), '\\s+') AS w
      FROM documents WHERE source = 'src0'
    ),
    bsh AS (
      SELECT DISTINCT array_to_string(w[CAST(i AS BIGINT):CAST(i+2 AS BIGINT)], ' ') AS sh
      FROM btoks, unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
      WHERE len(w) >= 3
    ),
    ch AS (SELECT id, CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h FROM csh),
    bh AS (SELECT DISTINCT CAST('0x' || substr(md5(sh), 1, 15) AS BIGINT) AS h FROM bsh)
    SELECT ch.id AS doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN bh.h IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_overlap,
           round(CAST(sum(CASE WHEN bh.h IS NULL THEN 0 ELSE 1 END) AS DOUBLE) / count(*), 6) AS overlap_ratio
    FROM ch LEFT JOIN bh ON ch.h = bh.h
    GROUP BY ch.id
    """,
)
def q73(spark, sf_dir):
    """Benchmark decontamination: distinct 3-gram overlap of every
    non-src0 document against the src0 'benchmark' set — inverted-index
    equi-join on 60-bit gram hashes (broadcast benchmark side), never
    doc×doc pairs."""
    d = t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src0").select("doc_id", "text")
    bench = d.filter(F.col("source") == "src0").select("doc_id", "text")
    return cur_ops.contamination(corpus, bench, n=3)


@query(
    "q74_repetition",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    bg AS (
      SELECT doc_id, lower(array_to_string(w[CAST(i AS BIGINT):CAST(i+1 AS BIGINT)], ' ')) AS bg
      FROM toks, unnest(range(1, len(w))) AS u(i)
      WHERE len(w) >= 2
    ),
    bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
    stats AS (
      SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_count FROM bgc GROUP BY doc_id
    ),
    tk AS (
      SELECT doc_id, count(*) AS n_tokens, count(DISTINCT lower(tok)) AS n_distinct_tokens
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents) x
      GROUP BY doc_id
    )
    SELECT stats.doc_id,
           CAST(tk.n_tokens AS BIGINT) AS n_tokens,
           CAST(tk.n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
           CAST(stats.n_bigrams AS BIGINT) AS n_bigrams,
           CAST(stats.top_bigram_count AS BIGINT) AS top_bigram_count,
           round(1.0 - CAST(tk.n_distinct_tokens AS DOUBLE) / tk.n_tokens, 6) AS dup_word_ratio,
           round(CAST(stats.top_bigram_count AS DOUBLE) / stats.n_bigrams, 6) AS top_bigram_ratio
    FROM stats JOIN tk ON stats.doc_id = tk.doc_id
    """,
)
def q74(spark, sf_dir):
    """Gopher-style repetition signals (duplicate-word fraction,
    top-bigram fraction): the boilerplate/spam filter of a quality
    pipeline. One explode + hash aggregations, all integer counts."""
    return cur_ops.repetition_signals(t(spark, sf_dir, "documents").select("doc_id", "text"))


@query("q75_stratified_sample", cur_ops.stratified_sample_oracle_sql())
def q75(spark, sf_dir):
    """Deterministic hash-bucket stratified sampling by language
    (mixture construction): keep iff md5(doc_id) mod 100 < rate[lang].
    Reproducible across engines/runs/retries — the property a seeded
    TABLESAMPLE (q60) cannot give. Map-side only."""
    return cur_ops.stratified_sample(t(spark, sf_dir, "documents"))


@query("q76_int8_cosine", cur_ops.int8_cosine_oracle_sql())
def q76(spark, sf_dir):
    """Int8-quantized exact top-k cosine: integer dot products over
    clip(round(x*127)) vectors; ranking decided by the INTEGER dot
    (cos_q is a value column from one identical IEEE op sequence).
    The 4×-smaller storage format a bandwidth-bound 100 TB retrieval
    scan wants; q37/q56 are the float baselines."""
    emb = t(spark, sf_dir, "embeddings")
    return cur_ops.int8_cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


@query(
    "q77_bigram_lm",
    cur_ops.BIGRAM_LM_ORACLE.format(table="documents", id_col="doc_id", text_col="text"),
)
def q77(spark, sf_dir):
    """Char-bigram corpus-frequency fluency score (LM-perplexity
    stand-in with the same dataflow: global model aggregate ->
    broadcast -> per-doc rescan). Integer sum_freq; avg is one
    division."""
    return cur_ops.bigram_lm_score(t(spark, sf_dir, "documents").select("doc_id", "text"))


@query("q78_curation_pipeline", cur_ops.curation_oracle_sql())
def q78(spark, sf_dir):
    """Composed keep/drop curation verdict (dup > too_short >
    low_quality > keep): exact-dedup window + closed-form quality
    signals in one plan — the decision a training-data pipeline
    materializes before writing the split."""
    return cur_ops.curation_verdict(t(spark, sf_dir, "documents").select("doc_id", "text"))


@query(
    "q85_thumbnail",
    """
    WITH th AS (
      SELECT doc_id,
             array_to_string(list_transform(
               range(0, CAST(ceil(length(text) / 7.0) AS BIGINT)),
               i -> substr(text, CAST(i * 7 + 1 AS INT), 1)), '') AS thumb
      FROM documents
    )
    SELECT doc_id AS media_id,
           CAST(length(thumb) AS BIGINT) AS thumb_bytes,
           md5(thumb) AS thumb_md5
    FROM th
    """,
)
def q85(spark, sf_dir):
    """Image-resize plumbing (stride-7 byte decimation as the stub
    resampler) over mapInPandas: payloads stay executor-local, the
    reduced thumbnail's size + content hash are the oracle-checked
    output (payload bytes are ASCII text, so DuckDB replays the
    decimation with substr)."""
    from .operators import multimodal as mm_ops

    d = t(spark, sf_dir, "documents")
    media = mm_ops.binarize(d, "doc_id", "text", "source", mime="image/x-fake")
    return mm_ops.thumbnail(media, stride=7).select("media_id", "thumb_bytes", "thumb_md5")


@query(
    "q86_audio_energy",
    """
    WITH w AS (
      SELECT doc_id,
             CAST(k AS BIGINT) AS win_idx,
             substr(text, CAST(k * 64 + 1 AS INT), 128) AS chunk
      FROM documents,
           unnest(range(0, (greatest(length(text) - 128, 0) + 63) // 64 + 1)) AS u(k)
    )
    SELECT doc_id AS media_id, win_idx,
           CAST(length(chunk) AS BIGINT) AS win_bytes,
           CAST(list_sum(list_transform(range(1, length(chunk) + 1),
                                        i -> ord(substr(chunk, CAST(i AS INT), 1)))) AS BIGINT) AS energy
    FROM w
    """,
)
def q86(spark, sf_dir):
    """Audio-frontend plumbing: overlapping 128-byte windows at hop 64,
    integer energy per window (sum of byte values — the RMS stand-in)
    via one mapInPandas pass; window boundaries, sizes, and energies
    all replayed exactly by the oracle on the ASCII payloads."""
    from .operators import multimodal as mm_ops

    d = t(spark, sf_dir, "documents")
    media = mm_ops.binarize(d, "doc_id", "text", "source", mime="audio/x-fake")
    return mm_ops.windowed_energy(media, win=128, hop=64)
