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


# ---------------------------------------------------------------------------
# Record linkage / entity resolution (q260-q261) — operators/linkage.py.
# A deterministic "vendor feed" is derived from part on BOTH engines
# (truncated names, reformatted brands, jittered sizes, no shared key),
# then linked back by blocked Fellegi-Sunter scoring. Ground truth is
# known (the feed row's source partkey), so precision is exact.
# ---------------------------------------------------------------------------

_FEED_SQL = """
  SELECT p_partkey AS b_id,
         upper(replace(CASE WHEN p_partkey % 5 = 0
                            THEN substr(p_name, 1, length(p_name) - 1)
                            ELSE p_name END, ' ', '_')) AS b_name,
         'B-' || regexp_extract(p_brand, '[0-9]+') AS b_brand,
         CAST(p_size + (p_partkey % 3) - 1 AS BIGINT) AS b_size,
         p_type AS b_type
  FROM part
"""

_NF_SQL = """
  SELECT b_id, lower(replace(b_name, '_', ' ')) AS nb,
         regexp_extract(b_brand, '[0-9]+') AS b_digits, b_size, b_type
  FROM feed
"""

_RT_SQL = """
  SELECT p_partkey, p_name, p_brand, p_type,
         regexp_extract(p_brand, '[0-9]+') AS p_digits,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
"""

_SCORE_SQL = """
  CAST(CASE WHEN levenshtein(nb, p_name) <= 1
            THEN 30 - 10 * levenshtein(nb, p_name) ELSE -100 END
       + CASE WHEN p_digits = b_digits THEN 40 ELSE -25 END
       + CASE WHEN abs(p_size - b_size) <= 1 THEN 15 ELSE -10 END AS BIGINT)
"""


def _vendor_feed(p):
    """The dirty feed: name possibly truncated by one char, brand
    reformatted 'Brand#17' -> 'B-17', size jittered by -1..+1 keyed on
    the source partkey — deterministic, so the oracle rebuilds it."""
    name_trunc = F.when(
        F.col("p_partkey") % 5 == 0,
        F.expr("substring(p_name, 1, length(p_name) - 1)"),
    ).otherwise(F.col("p_name"))
    return p.select(
        F.col("p_partkey").alias("b_id"),
        F.upper(F.regexp_replace(name_trunc, " ", "_")).alias("b_name"),
        F.concat(F.lit("B-"), F.regexp_extract("p_brand", "[0-9]+", 0)).alias("b_brand"),
        (F.col("p_size").cast("long") + F.col("p_partkey") % 3 - 1).alias("b_size"),
        F.col("p_type").alias("b_type"),
    )


def _linkage_sides(spark, sf_dir):
    from .operators import linkage as link_ops  # noqa: F401

    p = t(spark, sf_dir, "part")
    feed = _vendor_feed(p)
    nf = feed.select(
        "b_id",
        F.lower(F.regexp_replace("b_name", "_", " ")).alias("nb"),
        F.regexp_extract("b_brand", "[0-9]+", 0).alias("b_digits"),
        "b_size",
        "b_type",
    )
    rt = p.select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_type",
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("p_digits"),
        F.col("p_size").cast("long").alias("p_size"),
    )
    return p, nf, rt


def _score_candidates(cand):
    """Attach the linkage score. The q90 lesson applies directly:
    candidate volume is corpus-sized but the NAME domain is the entity
    vocabulary (heavily duplicated) — evaluating levenshtein per pair
    took 37s at sf0.1; computed once per DISTINCT (nb, p_name) combo
    and broadcast-joined back it's vocabulary-sized work. The binary
    components are cheap codegen'd compares and stay per-pair."""
    from .operators import linkage as link_ops

    lev = F.levenshtein("nb", "p_name")
    name_scores = (
        cand.select("nb", "p_name")
        .distinct()
        .withColumn(
            "name_score",
            F.when(lev <= 1, F.lit(30) - F.lit(10) * lev).otherwise(F.lit(-100)),
        )
    )
    binary = link_ops.agreement_score(
        [
            (F.col("p_digits") == F.col("b_digits"), 40, -25),
            (F.abs(F.col("p_size") - F.col("b_size")) <= 1, 15, -10),
        ]
    )
    return cand.join(F.broadcast(name_scores), ["nb", "p_name"]).withColumn(
        "score", (F.col("name_score") + binary).cast("long")
    )


@query(
    "q260_record_linkage",
    f"""
    WITH feed AS ({_FEED_SQL}),
    nf AS ({_NF_SQL}),
    rt AS ({_RT_SQL}),
    cand AS (
      SELECT nf.*, rt.p_partkey, rt.p_name, rt.p_brand, rt.p_type,
             rt.p_digits, rt.p_size
      FROM nf JOIN rt
        ON rt.p_type = nf.b_type
       AND substr(rt.p_name, 1, 4) = substr(nf.nb, 1, 4)
       AND rt.p_digits = nf.b_digits
       AND abs(rt.p_size - nf.b_size) <= 1),
    scored AS (SELECT *, {_SCORE_SQL} AS score FROM cand),
    best AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY b_id
                                     ORDER BY score DESC, p_partkey) AS rn
        FROM scored)
      WHERE rn = 1 AND score >= 60),
    truth AS (SELECT p_partkey AS t_key, p_name AS t_name,
                     p_brand AS t_brand, p_type AS t_type FROM part)
    SELECT score,
           CAST(count(*) AS BIGINT) AS n_links,
           CAST(sum(CASE WHEN p_partkey = b_id THEN 1 ELSE 0 END) AS BIGINT) AS n_key_match,
           CAST(sum(CASE WHEN p_name = t_name AND p_brand = t_brand
                          AND p_type = t_type THEN 1 ELSE 0 END) AS BIGINT) AS n_attr_match
    FROM best JOIN truth ON t_key = b_id
    GROUP BY score
    """,
)
def q260(spark, sf_dir):
    """Blocked record linkage (operators/linkage.py): vendor feed
    linked back to the part catalog WITHOUT a shared key. Blocking is
    an equi-join on (type, 4-char name prefix, ±1 size band) — the
    band made exact by exploding each catalog row to its three
    acceptable sizes (sorted-neighborhood blocking; never a cross
    join); scoring is Fellegi-Sunter additive integer log-odds with
    levenshtein computed once per DISTINCT name pair and broadcast
    back (the q90 vocabulary-bound lesson: per-pair evaluation cost
    37s at sf0.1, the distinct+banded form runs in ~2.5s); best match
    per feed row is a max_by hash aggregate (map-side combinable), not
    a row_number window. Output: per score band, link count, exact-key
    precision, and attribute-equivalence precision (name clones are
    attribute-identical — key mismatches that are still correct golden
    records). q261 keeps the UNBANDED prefix pass to show the
    candidate-volume tradeoff the band buys back."""
    from .operators import linkage as link_ops

    p, nf, rt = _linkage_sides(spark, sf_dir)
    # size banding rides the BLOCK key (sorted-neighborhood style): the
    # ±1 band becomes an exact equi-join by exploding each catalog row
    # to its three acceptable sizes — on the bounded-vocab fixture this
    # cut candidates ~50x (8.4M -> 170k at sf0.1) with recall intact
    # (a pair outside the band can't be a link under this rule set)
    rt3 = rt.withColumn("__d", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1)))).withColumn(
        "bsz", (F.col("p_size") + F.col("__d")).cast("long")
    )
    # brand digits join the block key too: a brand-mismatch candidate
    # scores at most 30-25+15=20 < the 60 threshold, and best_match
    # takes the MAX score, so dropping sub-threshold candidates can
    # never change the emitted links (Fellegi-Sunter: fields whose
    # disagreement kills the score belong in the block key)
    cand = link_ops.candidate_pairs(
        nf.withColumn("bk", F.substring("nb", 1, 4)),
        rt3.withColumn("pk", F.substring("p_name", 1, 4)),
        [("b_type", "p_type"), ("bk", "pk"), ("b_digits", "p_digits"), ("b_size", "bsz")],
    ).drop("__d", "bsz")
    scored = _score_candidates(cand)
    best = link_ops.best_match(scored, "b_id", "score", tiebreak="p_partkey", threshold=60)
    truth = p.select(
        F.col("p_partkey").alias("t_key"),
        F.col("p_name").alias("t_name"),
        F.col("p_brand").alias("t_brand"),
        F.col("p_type").alias("t_type"),
    )
    return (
        best.join(truth, best["b_id"] == truth["t_key"])
        .groupBy("score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.sum(F.when(F.col("p_partkey") == F.col("b_id"), 1).otherwise(0)).cast("long").alias("n_key_match"),
            F.sum(
                F.when(
                    (F.col("p_name") == F.col("t_name"))
                    & (F.col("p_brand") == F.col("t_brand"))
                    & (F.col("p_type") == F.col("t_type")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_attr_match"),
        )
    )


@query(
    "q261_multipass_blocking",
    f"""
    WITH feed AS ({_FEED_SQL}),
    nf AS ({_NF_SQL}),
    rt AS ({_RT_SQL}),
    p1 AS (SELECT b_id, p_partkey FROM nf JOIN rt
             ON rt.p_type = nf.b_type
            AND substr(rt.p_name, 1, 4) = substr(nf.nb, 1, 4)),
    p2 AS (SELECT b_id, p_partkey FROM nf JOIN rt
             ON rt.p_digits = nf.b_digits AND rt.p_size = nf.b_size),
    pu AS (SELECT * FROM p1 UNION SELECT * FROM p2),
    all_pairs AS (
      SELECT 'prefix' AS strategy, * FROM p1
      UNION ALL SELECT 'brand_size', * FROM p2
      UNION ALL SELECT 'union', * FROM pu),
    scored AS (
      SELECT ap.strategy, ap.b_id, ap.p_partkey, {_SCORE_SQL} AS score
      FROM all_pairs ap JOIN nf USING (b_id) JOIN rt USING (p_partkey)),
    best AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY strategy, b_id
                                     ORDER BY score DESC, p_partkey) AS rn
        FROM scored)
      WHERE rn = 1 AND score >= 60),
    cand_counts AS (SELECT strategy, CAST(count(*) AS BIGINT) AS n_candidates
                    FROM all_pairs GROUP BY strategy),
    link_counts AS (SELECT strategy, CAST(count(*) AS BIGINT) AS n_links,
                           CAST(sum(CASE WHEN p_partkey = b_id THEN 1 ELSE 0 END) AS BIGINT) AS n_key_match
                    FROM best GROUP BY strategy)
    SELECT c.strategy, c.n_candidates,
           CAST(coalesce(l.n_links, 0) AS BIGINT) AS n_links,
           CAST(coalesce(l.n_key_match, 0) AS BIGINT) AS n_key_match
    FROM cand_counts c LEFT JOIN link_counts l USING (strategy)
    """,
)
def q261(spark, sf_dir):
    """Multi-pass blocking recall study: pass 1 blocks on (type, name
    prefix); pass 2 on (brand digits, exact size) — each narrow, each
    blind to the other's misses (the size jitter defeats pass 2 for
    two thirds of rows); the union deduplicates PAIR KEYS before the
    single shared scoring pass (operators/linkage.union_pair_keys), so
    no pair is scored twice. Output per strategy: candidate volume vs
    links vs exact-key hits — the recall/cost tradeoff that decides
    blocking design at 100 TB."""
    from .operators import linkage as link_ops

    _p, nf, rt = _linkage_sides(spark, sf_dir)
    # each pass is consumed twice (directly + via the union) and
    # all_pairs twice more (scoring + candidate counts): checkpoint the
    # two pair sets once — 2-column longs, never re-join per consumer
    p1 = (
        link_ops.candidate_pairs(
            nf.withColumn("bk", F.substring("nb", 1, 4)),
            rt.withColumn("pk", F.substring("p_name", 1, 4)),
            [("b_type", "p_type"), ("bk", "pk")],
        )
        .select("b_id", "p_partkey")
        .localCheckpoint()
    )
    p2 = (
        link_ops.candidate_pairs(nf, rt, [("b_digits", "p_digits"), ("b_size", "p_size")])
        .select("b_id", "p_partkey")
        .localCheckpoint()
    )
    pu = link_ops.union_pair_keys([p1, p2])
    all_pairs = (
        p1.withColumn("strategy", F.lit("prefix"))
        .unionByName(p2.withColumn("strategy", F.lit("brand_size")))
        .unionByName(pu.withColumn("strategy", F.lit("union")))
    )
    scored = _score_candidates(all_pairs.join(nf, "b_id").join(rt, "p_partkey"))
    best = link_ops.best_match(scored, ["strategy", "b_id"], "score", tiebreak="p_partkey", threshold=60)
    cand_counts = all_pairs.groupBy("strategy").agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    link_counts = best.groupBy("strategy").agg(
        F.count(F.lit(1)).cast("long").alias("n_links"),
        F.sum(F.when(F.col("p_partkey") == F.col("b_id"), 1).otherwise(0)).cast("long").alias("n_key_match"),
    )
    return cand_counts.join(link_counts, "strategy", "left").select(
        "strategy",
        "n_candidates",
        F.coalesce("n_links", F.lit(0)).cast("long").alias("n_links"),
        F.coalesce("n_key_match", F.lit(0)).cast("long").alias("n_key_match"),
    )


# ---------------------------------------------------------------------------
# q262 — per-source line-frequency boilerplate removal (CCNet/RefinedWeb
# style). Template lines (header / footer / a newsletter banner on every
# 7th doc) are injected deterministically on BOTH engines with an
# explicit ' <br> ' line separator, then operators/curation.
# strip_boilerplate_lines removes every line whose per-source document
# frequency reaches max(2, docs(source) DIV 10).
# ---------------------------------------------------------------------------

_BP_SQL = """
  SELECT doc_id, source,
         'site ' || source || ' home about' || ' <br> ' ||
         CASE WHEN doc_id % 7 = 0
              THEN 'subscribe to ' || source || ' newsletter' || ' <br> '
              ELSE '' END ||
         text ||
         ' <br> copyright ' || source || ' all rights reserved' AS t2
  FROM documents
"""


def _bp_docs(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("site "),
            F.col("source"),
            F.lit(" home about <br> "),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit("subscribe to "), F.col("source"), F.lit(" newsletter <br> ")),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.lit(" <br> copyright "),
            F.col("source"),
            F.lit(" all rights reserved"),
        ).alias("t2"),
    )


@query(
    "q262_boilerplate_lines",
    f"""
    WITH d AS ({_BP_SQL}),
    parts AS (SELECT doc_id, source, string_split(t2, ' <br> ') AS p FROM d),
    lines AS (
      SELECT doc_id, source, CAST(u.li AS BIGINT) AS li, p[CAST(u.li + 1 AS BIGINT)] AS line
      FROM parts, unnest(range(0, len(p))) AS u(li)
    ),
    src_docs AS (SELECT source, CAST(count(*) AS BIGINT) AS nd FROM documents GROUP BY source),
    lfreq AS (SELECT source, line, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
              FROM lines GROUP BY source, line),
    boiler AS (
      SELECT l.source, l.line
      FROM lfreq l JOIN src_docs s USING (source)
      WHERE l.df >= greatest(2, s.nd // 10)),
    kept AS (
      SELECT li.doc_id, li.li, li.line
      FROM lines li LEFT JOIN boiler b ON b.source = li.source AND b.line = li.line
      WHERE b.line IS NULL),
    rebuilt AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept_lines,
             md5(string_agg(line, ' ' ORDER BY li)) AS clean_md5
      FROM kept GROUP BY doc_id),
    tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM lines GROUP BY doc_id)
    SELECT tot.doc_id, tot.n_lines,
           CAST(coalesce(r.n_kept_lines, 0) AS BIGINT) AS n_kept_lines,
           coalesce(r.clean_md5, md5('')) AS clean_md5
    FROM tot LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q262(spark, sf_dir):
    """Line-frequency boilerplate removal (operators/curation.
    strip_boilerplate_lines): template lines recurring across
    max(2, docs(source) DIV 10) documents of the SAME source are
    stripped everywhere — the header and footer vanish from every doc,
    the every-7th-doc newsletter banner clears the threshold and
    vanishes too, and genuine content survives (verified by md5 of
    the rebuilt text per doc). One posexplode + a (source, line)
    aggregation + an anti-join; the threshold scales with the source
    so it can't silently turn off (SCALE.md §65 lesson)."""
    from .operators import curation as cur_ops

    out = cur_ops.strip_boilerplate_lines(_bp_docs(spark, sf_dir), "doc_id", "source", "t2")
    return out.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        F.md5("clean_text").alias("clean_md5"),
    )
