"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the point of each variant):
- exact_dedup: one hash-aggregate shuffle on a fingerprint — the
  cheapest possible dedup at any scale; keeps min(id) per group so the
  result is deterministic.
- ngram_jaccard_best_match: exact pairwise Jaccard restricted by an
  inverted shingle index (explode -> equi-join on shingle), so the
  shuffle is O(shared-shingle pairs), not O(n²). Fully verifiable in
  SQL.
- minhash_lsh_dedup: Spark ML MinHashLSH banding — the 100 TB path:
  candidate pairs come from equi-joins on band buckets; per-pair work
  only on candidates. Approximate, so it gets a rows-only driver check.
- simhash: 64-bit fingerprint whose Hamming distance approximates
  cosine on token sets; computed with xxhash64 + bit ops, all JVM-side.
- embedding near-dup: cosine over normalized vectors; exact for
  verification, LSH-bucketed variant in operators/similarity.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import fingerprint, tokens, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate removal by md5 fingerprint: one row per distinct
    normalized text, keeping the smallest id (deterministic winner).
    Plan: partial hash-agg -> shuffle on fingerprint -> final agg."""
    fp = fingerprint(df, text_col)
    return fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("keep_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram (word-shingle) Jaccard for every candidate pair that
    shares >=1 shingle. Inverted-index join: explode distinct shingles,
    self-equi-join on shingle (shuffle co-partitions by shingle — no
    cross join anywhere), count intersections, then |A∪B| from per-doc
    distinct-shingle counts. Returns (id_a, id_b, jaccard), id_a<id_b."""
    # carry each doc's distinct-shingle count THROUGH the explode so the
    # sizes need no extra joins (which would recompute the explode
    # subtree); the whole op is one equi-join + one aggregate.
    spark = df.sparkSession
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("__text"))
    # a small doc corpus often arrives as ONE scan partition (one file);
    # spread the shingling across cores first
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if src.rdd.getNumPartitions() < max(2, target // 2):
        src = src.repartition(target, "id")
    # explode POSITIONS, then build each shingle with slice+concat_ws:
    # everything stays in whole-stage codegen. (The transform-then-
    # explode form runs the interpreted higher-order path, and the
    # optimizer's generate-filter inference re-evaluates it per row —
    # measured 10x slower.)
    toks = src.select("id", tokens("__text").alias("toks")).filter(F.size("toks") >= n)
    positions = toks.select(
        "id", "toks", F.explode(F.sequence(F.lit(1), F.size("toks") - F.lit(n - 1))).alias("i")
    )
    # the shingle string is hashed to a LONG immediately: every
    # downstream shuffle/distinct/join keys on 8-byte longs instead of
    # ~20-byte strings (measured ~2x on the pair stage). A 64-bit
    # collision within one engine would need ~2^32 distinct shingles —
    # counts are exact at any realistic corpus, and the DuckDB oracle
    # (joining on the string itself) stays bit-identical.
    sh_rows = positions.select(
        "id", F.xxhash64(F.concat_ws(" ", F.slice("toks", F.col("i"), n))).alias("sh")
    )
    # the self-join + sizes + hot-filter all reference this subtree
    # (four plan branches); persist + EAGER fill so tokenize+distinct
    # run once (same pattern Spark ML uses inside approxSimilarityJoin;
    # the count() barrier matters — with a lazy persist the concurrent
    # consumer stages of one job race to fill the cache, each
    # computing its own copy — r6 opt)
    distinct_sh = sh_rows.distinct().persist()
    distinct_sh.count()
    # per-doc distinct-shingle counts: tiny (one row per doc) — joined
    # onto the pair AGGREGATE (not carried through the explode join via
    # a window, which costs an extra shuffle+sort on the widest data).
    # AQE broadcasts it when small; at billion-doc scale it degrades to
    # an ordinary shuffle join on the already-aggregated pairs.
    sizes = distinct_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_sh"))
    shingled = distinct_sh
    if max_df is not None:
        # stop-shingle removal: a shingle shared by > max_df docs
        # contributes pairs quadratically while carrying almost no
        # near-dup signal. On dup-heavy corpora ALSO run exact_dedup
        # first — identical docs make pairwise growth genuinely
        # quadratic (measured: 10x replicated corpus -> 100x pairs;
        # see SCALE.md). NOTE: dropped shingles leave n_sh unchanged,
        # so jaccard becomes a lower bound for affected pairs.
        hot = shingled.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") > max_df)
        shingled = shingled.join(F.broadcast(hot.select("sh")), "sh", "left_anti")
    a = shingled.alias("a")
    b = shingled.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 6).alias("jaccard"),
        )
    )


def ngram_jaccard_best_match(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = None,
    min_jaccard: float | None = None,
) -> DataFrame:
    """For each document, its best Jaccard match among docs sharing a
    shingle (the 'which doc is this nearest-duplicate of?' primitive).
    Deterministic: ties broken toward the smaller partner id.
    max_df caps stop-shingles (see ngram_jaccard_pairs); min_jaccard
    drops sub-threshold pairs BEFORE the best-match aggregate — the
    threshold a dedup pipeline always has, and a large output cut."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, n, max_df=max_df)
    if min_jaccard is not None:
        # raw-jaccard compare: a single integer division is bit-identical
        # across engines, so the SQL oracle applies the same predicate
        pairs = pairs.filter(F.col("jaccard") >= min_jaccard)
    # symmetrize with ONE explode instead of union-of-swapped-pairs —
    # a union would recompute the (expensive) pair join for each branch
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("id_a").alias("id"), F.col("id_b").alias("other"), F.col("jaccard")),
                F.struct(F.col("id_b").alias("id"), F.col("id_a").alias("other"), F.col("jaccard")),
            )
        ).alias("p")
    ).select("p.id", "p.other", "p.jaccard")
    best = sym.groupBy("id").agg(
        F.max(F.struct(F.col("jaccard"), (-F.col("other")).alias("neg_other"))).alias("b")
    )
    return best.select(
        F.col("id").alias(id_col),
        (-F.col("b.neg_other")).cast("long").alias("best_match_id"),
        F.col("b.jaccard").alias("best_jaccard"),
    )


def dedup_pipeline(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_df: int | None = 20,
    min_jaccard: float = 0.1,
) -> DataFrame:
    """The scale-safe near-dup pipeline SCALE.md prescribes, as ONE
    operator (and the benched representative of n-gram dedup):

    1. exact dedup FIRST — identical docs make pairwise output
       quadratic (measured: 10x replicated corpus -> 100x pairs);
       only fingerprint-unique keepers enter the pairwise stage,
    2. inverted-index Jaccard with the stop-shingle cap (max_df),
    3. similarity threshold BEFORE the best-match aggregate — a real
       pipeline never materializes sub-threshold pairs.

    Output: (doc_id, best_match_id, best_jaccard) for keeper docs whose
    best match clears the threshold."""
    keep = exact_dedup(df, text_col, id_col).select(F.col("keep_id").alias(id_col))
    docs = df.join(keep, id_col, "left_semi")
    return ngram_jaccard_best_match(
        docs, id_col, text_col, n, max_df=max_df, min_jaccard=min_jaccard
    )


def simhash(df: DataFrame, text_col: str = "text", bits: int = 64, out_col: str = "simhash", hash_fn=None) -> DataFrame:
    """SimHash over whitespace tokens: per bit, sign(sum over tokens of
    ±1) — vectorized as an aggregate over exploded tokens. Near-dups
    have small Hamming distance.

    hash_fn picks the token-hash family: default xxhash64 (fastest,
    JVM-native — engine-specific, so not oracle-checkable); pass
    det_hash.md5_long-based hashing (see queries q36) for a hash the
    DuckDB oracle reproduces bit-identically."""
    if hash_fn is None:
        hash_fn = F.xxhash64
    toks = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    id_cols = [c for c in df.columns]
    exploded = df.select(*id_cols, toks).withColumn("h", hash_fn(F.col("tok")))
    bit_sums = exploded.groupBy(*id_cols).agg(
        *[
            F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(0))
    return bit_sums.select(*id_cols, sig.alias(out_col))


def hamming64(a, b):
    return F.bit_count(F.col(a).bitwiseXOR(F.col(b)))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs via Spark ML: shingle ->
    HashingTF sparse vectors -> MinHashLSH.approxSimilarityJoin. The
    banding join is the 100 TB-scale path (no pairwise blow-up).
    Output: (id_a, id_b, jaccard_dist) for candidates under threshold
    distance. Approximate -> rows-only driver check."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    docs = df.select(F.col(id_col).alias("id"), F.array_distinct(word_shingles(text_col, n)).alias("shingles"))
    docs = docs.filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True)
    feat = tf.transform(docs)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=42)
    model = mh.fit(feat)
    joined = model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


def embedding_near_dup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs (cos >= threshold).
    Self-join is bounded by block-wise broadcast; for 100 TB use the
    LSH-bucketed variant (similarity.ann_lsh) — this exact form is the
    verification baseline."""
    from .similarity import with_norm, cosine

    a = with_norm(df, vec_col).select(F.col(id_col).alias("id_a"), F.col("__vec").alias("va"), F.col("__norm").alias("na"))
    b = with_norm(df, vec_col).select(F.col(id_col).alias("id_b"), F.col("__vec").alias("vb"), F.col("__norm").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = cosine("va", "vb", "na", "nb")
    return pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine")).filter(F.col("cosine") >= threshold)


def incremental_dedup(
    new_batch: DataFrame,
    seen: "Table",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Production-shaped exact dedup: filter a NEW batch against the
    historical fingerprint corpus, then record the survivors'
    fingerprints — so the corpus state lives in an engine table
    (versioned, upsertable), not in a re-scan of all prior raw text.

    Steps (each scale-proportional to the BATCH, never to history
    except the one anti-join probe):
      1. fingerprint the batch, drop intra-batch dups (min-id wins),
      2. anti-join against seen's fingerprint column,
      3. upsert the survivors' (fingerprint, keep_id) into seen —
         idempotent on retry because upsert keys on fingerprint,
      4. return the surviving rows of the batch.

    ``seen`` must be a writable engine Table init'd with
    unique_on='fingerprint'. The anti-join shuffles fingerprints (16
    bytes/row), and at 100 TB the seen table is partition/cluster-able
    like any engine table."""
    batch = fingerprint(new_batch, text_col)
    win = Window.partitionBy("fingerprint").orderBy(F.col(id_col).asc())
    intra = batch.withColumn("__rk", F.row_number().over(win)).filter(F.col("__rk") == 1).drop("__rk")
    if seen.record_count:
        seen_fps = seen.read_spark().select("fingerprint")
        survivors = intra.join(seen_fps, "fingerprint", "left_anti")
    else:
        survivors = intra
    seen.upsert(survivors.select("fingerprint", F.col(id_col).alias("keep_id")))
    seen.flush()
    return survivors
