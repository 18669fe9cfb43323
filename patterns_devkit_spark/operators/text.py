"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in ``pyspark.sql.functions`` expressions
(JVM-side, whole-stage codegen) — no Python UDFs — so they vectorize
and survive a 100 TB scan. Each operator has a deterministic,
SQL-expressible definition so a DuckDB oracle can verify it.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Small multilingual marker-word lists for the language-ID heuristic.
# Deliberately deterministic + tiny: real pipelines swap in fastText —
# the Spark plumbing (score -> argmax, all JVM-side) is the point.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "et", "les", "des", "est"],
    "es": ["el", "de", "los", "las", "es"],
}

EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (split on runs of whitespace)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_shingles(col: Column | str, n: int) -> Column:
    """n-word shingles as 'w1 w2 ... wn' strings — the unit for n-gram
    Jaccard dedup. Built from transform over a token array (JVM-side)."""
    toks = tokens(col)
    k = F.size(toks) - F.lit(n - 1)
    # guard: F.sequence(1, 0) yields a DESCENDING sequence, not empty
    return F.when(
        k >= 1, F.transform(F.sequence(F.lit(1), k), lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring signals: chars, words, avg word length, stopword
    ratio, punctuation ratio, uppercase ratio. All closed-form column
    expressions."""
    toks = tokens(text_col)
    n_words = F.size(toks)
    n_chars = F.length(text_col)
    stop_arr = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_punct = n_chars - F.length(F.regexp_replace(text_col, r"[^\w\s]", ""))
    return df.select(
        "*",
        n_words.alias("n_words"),
        n_chars.alias("n_chars_calc"),
        F.round(n_chars / F.greatest(n_words, F.lit(1)), 6).alias("avg_word_len"),
        F.round(n_stop / F.greatest(n_words, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """A simple deterministic quality score in [0,1]: rewards mid-length
    documents and a sane stopword ratio (C4/Gopher-style rule scoring,
    simplified to closed form)."""
    stats = text_stats(df, text_col)
    len_score = F.least(F.col("n_words") / F.lit(50.0), F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * F.lit(5.0), F.lit(1.0))
    return stats.withColumn("quality_score", F.round(0.7 * len_score + 0.3 * stop_score, 6))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count marker hits per language, argmax
    with deterministic tie-break on language code ('und' when no
    markers hit). Pure column expressions -> scales linearly."""
    toks = tokens(text_col)
    scores = []
    for lang, words in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in words])
        score = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    # argmax: sort (score asc, lang desc) and take last => max score,
    # ties broken toward the alphabetically-first language
    best = F.sort_array(F.array(*scores)).getItem(len(scores) - 1)
    return df.select(
        "*",
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("pred_lang"),
        best["score"].alias("lang_score"),
    )


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_pieces(col: Column | str) -> Column:
    """GPT-2-style pre-tokenization (simplified, ASCII): runs of
    letters, runs of digits, or single punctuation marks. The piece
    count approximates BPE token count far better than whitespace
    splitting (punctuation and numbers tokenize separately). Pattern
    kept to a regex subset Spark (Java) and DuckDB (RE2) interpret
    identically, so the count is oracle-verifiable."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count + punct piece count
    (the training-data budgeting triple), all JVM-side expressions."""
    pieces = bpe_ish_pieces(text_col)
    return df.select(
        "*",
        token_count(text_col).cast("long").alias("n_ws_tokens"),
        F.size(pieces).cast("long").alias("n_bpe_pieces"),
        F.size(F.filter(pieces, lambda p: p.rlike(r"^[^A-Za-z0-9]$"))).cast("long").alias("n_punct_pieces"),
    )


def bottomk_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    gram: int = 8,
) -> DataFrame:
    """Winnowing-style document sketch: the k smallest md5-derived
    hashes over the doc's DISTINCT character `gram`-grams (a bottom-k
    set sketch — Broder's min-wise family, same estimator MinHash
    uses). Identical docs share the whole sketch; near-dups share most
    of it. Emits (id, rk, gram_hash) rows; all-integer, so the DuckDB
    oracle replays it exactly. One explode + distinct + per-doc top-k:
    scales like shingling."""
    from .det_hash import md5_long

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    pos = src.filter(F.length("__text") >= gram).select(
        "id", F.explode(F.sequence(F.lit(1), F.length("__text") - F.lit(gram - 1))).alias("i"), "__text"
    )
    grams = pos.select("id", md5_long(F.col("__text").substr(F.col("i"), F.lit(gram))).alias("h")).distinct()
    w = Window.partitionBy("id").orderBy(F.col("h").asc())
    return (
        grams.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(F.col("id").alias(id_col), F.col("rk").cast("long").alias("rk"), F.col("h").alias("gram_hash"))
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: md5 of whitespace-normalized lowercased
    text. md5 is bit-identical across Spark and DuckDB, so exact-dup
    grouping on the fingerprint is oracle-verifiable."""
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "))
    return df.withColumn(out_col, F.md5(norm))
