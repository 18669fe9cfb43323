"""Corpus-construction battery (q201-q203): importance resampling,
tokenizer training, and filter-funnel attribution — the three
training-data operations the earlier batteries did not yet cover
(selection by distribution match, vocab induction, and per-rule
rejection accounting).

Same det-hash discipline as the rest of the repo: every value the
driver hash-checks is integer-exact (floor-log2 via length(bin(x)),
integer cross-multiplied ratio tests, md5-derived bucket hashes), so
DuckDB replays the full pipeline bit-for-bit.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from .node.node import CheckConstraintViolation
from .operators.det_hash import distinct_shingles, md5_long
from .operators.text import tokens, word_shingles
from .queries import query, t

# =====================================================================
# q201 — DSIR-style importance weighting (hashed n-gram log-ratio)
# =====================================================================

_DSIR_B = 4096  # hash-feature buckets


@query(
    "q201_dsir_importance",
    f"""
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split_regex(trim(text), '\\s+')) AS token
      FROM documents
    ),
    tokb AS (
      SELECT doc_id, source,
             CAST('0x' || substr(md5(token), 1, 15) AS BIGINT) % {_DSIR_B} AS b
      FROM tok WHERE token <> ''
    ),
    ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM tokb WHERE source = 'src0' GROUP BY b),
    cr AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM tokb WHERE source <> 'src0' GROUP BY b),
    wt AS (
      SELECT COALESCE(ct.b, cr.b) AS b,
             CAST(length(bin(COALESCE(ct, 0) + 1)) AS BIGINT)
               - CAST(length(bin(COALESCE(cr, 0) + 1)) AS BIGINT) AS lam
      FROM ct FULL OUTER JOIN cr ON ct.b = cr.b
    ),
    score AS (
      SELECT tokb.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(wt.lam) AS BIGINT) AS score
      FROM tokb JOIN wt ON tokb.b = wt.b
      WHERE tokb.source <> 'src0'
      GROUP BY tokb.doc_id
    )
    SELECT s.doc_id, d.source, s.n_tokens, s.score
    FROM score s JOIN documents d ON d.doc_id = s.doc_id
    ORDER BY s.score DESC, s.doc_id LIMIT 50
    """,
)
def q201(spark, sf_dir):
    """DSIR-style importance weighting (Xie et al. 2023, 'Data
    Selection for Language Models via Importance Resampling'): score
    raw-pool documents by how target-like their hashed-unigram
    distribution is. Target = the src0 slice, raw = everything else;
    features are md5-hashed token buckets (B=4096); the per-bucket
    log-likelihood-ratio is the integer floor-log2 difference
    length(bin(ct+1)) - length(bin(cr+1)) — the same bin()-trick as
    q196/q198, so both engines agree bit-for-bit at ANY corpus size
    (no float log, no overflow: the counts never leave bigint).

    100 TB shape: two token-grain hash-aggs build the 4096-row weight
    table (map-side combine on a bounded key domain), the table
    BROADCASTS to the scoring scan, and the per-doc score is one more
    hash-agg — no shuffle carries strings (tokens reduce to bucket
    ids), no all-pairs anything. Top-50 is a TakeOrdered, not a global
    sort."""
    docs = t(spark, sf_dir, "documents")
    tokb = (
        docs.select("doc_id", "source", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .select("doc_id", "source", (md5_long("token") % _DSIR_B).alias("b"))
    )
    # ONE conditional aggregation builds both sides of the 4096-row
    # weight table (the bucket set — buckets with any token — and the
    # per-side counts are identical to the old two-filtered-agg +
    # full_outer join, with 0 standing in for the old NULL-coalesce),
    # so the tokenize/explode pass for the table runs once, not twice
    # (r6 opt); the target/raw split rides a when() inside the agg
    wt = (
        tokb.groupBy("b")
        .agg(
            F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).cast("long").alias("ct"),
            F.sum(F.when(F.col("source") != "src0", 1).otherwise(0)).cast("long").alias("cr"),
        )
        .select(
            "b",
            (
                F.length(F.expr("bin(ct + 1)")).cast("long")
                - F.length(F.expr("bin(cr + 1)")).cast("long")
            ).alias("lam"),
        )
    )
    # source rides the scoring groupBy (doc_id -> source is functional,
    # same groups) instead of a join back onto the documents scan
    score = (
        tokb.filter(F.col("source") != "src0")
        .join(F.broadcast(wt), "b")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"), F.sum("lam").cast("long").alias("score"))
    )
    return (
        score.select("doc_id", "source", "n_tokens", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(50)
    )


# =====================================================================
# q202 — BPE tokenizer training (3 deterministic merge iterations)
# =====================================================================

_BPE_ITERS = 3


def _bpe_oracle_sql(iters: int) -> str:
    """Chained-CTE replay of the merge loop: stage k computes pair
    counts from s{k-1}, picks the argmax (count DESC, pair ASC), and
    rewrites every word's symbol sequence with the double-replace
    merge procedure (see q202 docstring for why double)."""
    parts = [
        """
    WITH w AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents) x
      WHERE word <> '' GROUP BY 1
    ),
    s0 AS (SELECT word, freq, trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS seq FROM w)"""
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
    p{k} AS (
      SELECT pr, CAST(sum(freq) AS BIGINT) AS c FROM (
        SELECT freq, arr[i + 1] || ' ' || arr[i + 2] AS pr
        FROM (SELECT freq, string_split(seq, ' ') AS arr FROM s{k - 1}) t,
             unnest(range(len(arr) - 1)) AS u(i)
      ) GROUP BY pr
    ),
    b{k} AS (SELECT pr, c FROM p{k} ORDER BY c DESC, pr LIMIT 1),
    s{k} AS (
      SELECT word, freq,
             trim(replace(replace(' ' || seq || ' ',
                                  (SELECT ' ' || pr || ' ' FROM b{k}),
                                  (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM b{k})),
                          (SELECT ' ' || pr || ' ' FROM b{k}),
                          (SELECT ' ' || replace(pr, ' ', '') || ' ' FROM b{k}))) AS seq
      FROM s{k - 1}
    )"""
        )
    finals = [
        f"SELECT CAST({k} AS BIGINT) AS it, pr AS merged_pair, c AS pair_count,"
        f" (SELECT CAST(count(*) AS BIGINT) FROM p{k}) AS n_pairs FROM b{k}"
        for k in range(1, iters + 1)
    ]
    return "".join(parts) + "\n    " + "\n    UNION ALL ".join(finals) + "\n    ORDER BY it"


@query("q202_bpe_train", _bpe_oracle_sql(_BPE_ITERS))
def q202(spark, sf_dir):
    """BPE tokenizer training, first 3 merges (Sennrich et al. 2016):
    corpus word-frequency table -> per-word symbol sequence (chars) ->
    iterate {count adjacent symbol pairs weighted by word freq, merge
    the argmax pair corpus-wide}. Ties break (count DESC, pair ASC) —
    fully deterministic, and the DuckDB oracle replays the LOOP ITSELF
    as chained CTEs, so the learned merges are hash-checked, not just
    plausible.

    Merge procedure: non-overlapping left-to-right literal replace of
    ' a b ' with ' ab ' on the padded sequence, applied TWICE — one
    pass misses occurrences that share a delimiter space with a
    consumed match (e.g. 'a b a b'); leftovers after pass one are
    always flanked by merged tokens, so pass two is exhaustive. Both
    engines scan left-to-right non-overlapping, hence identical
    results. (For same-symbol runs this can differ from strict-greedy
    BPE tokenization order; the procedure itself is the deterministic
    spec both engines replay.)

    100 TB shape: the expensive scan is the ONE word-frequency agg
    over the corpus (Zipf domain, map-side combine); the merge loop
    runs on the DISTINCT-word table (vocab-sized, millions of rows,
    not corpus-sized) — the classic BPE-training factorization. Each
    iteration is one bounded hash-agg + one scalar broadcast
    (argmax pair to the driver, O(iterations) small jobs, like
    q123 pagerank)."""
    docs = t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    cur = w.select("word", "freq", F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"))
    # vocab-sized table iterated 3x: keep it materialized across passes
    cur = cur.persist()
    out_rows = []
    try:
        for it in range(1, _BPE_ITERS + 1):
            pairs = (
                cur.withColumn("arr", F.split("seq", " "))
                .filter(F.size("arr") >= 2)
                .select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(arr) - 2),"
                            " i -> concat(element_at(arr, i + 1), ' ', element_at(arr, i + 2)))"
                        )
                    ).alias("pr"),
                )
                .groupBy("pr")
                .agg(F.sum("freq").cast("long").alias("c"))
            )
            pairs = pairs.persist()
            n_pairs = pairs.count()
            best = pairs.orderBy(F.desc("c"), "pr").limit(1).collect()[0]
            pairs.unpersist()
            out_rows.append((it, best["pr"], best["c"], n_pairs))
            pat = F.lit(f" {best['pr']} ")
            rep = F.lit(f" {best['pr'].replace(' ', '')} ")
            padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
            nxt = cur.select(
                "word", "freq", F.trim(F.replace(F.replace(padded, pat, rep), pat, rep)).alias("seq")
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(out_rows, "it bigint, merged_pair string, pair_count bigint, n_pairs bigint").orderBy("it")


# =====================================================================
# q208 — BPE tokenizer APPLY (dictionary-join inference over the corpus)
# =====================================================================


def _bpe_apply_oracle_sql(iters: int) -> str:
    """q202's training stages, then APPLY: every distinct word's final
    segmentation comes out of stage s{iters}; per-doc subword counts
    are a token->dictionary join, rolled up per source."""
    train = _bpe_oracle_sql(iters)
    # reuse the training CTE chain; replace the final SELECT with apply
    head = train[: train.rindex("\n    SELECT CAST(1 AS BIGINT)")]
    return (
        head
        + f""",
    vocab AS (
      SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS n_subwords FROM s{iters}
    ),
    tok AS (
      SELECT d.source, u.tok
      FROM documents d, unnest(string_split_regex(trim(d.text), '\\s+')) AS u(tok)
    ),
    per_source AS (
      SELECT t.source,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(v.n_subwords) AS BIGINT) AS n_subwords,
             CAST(sum(length(t.tok)) AS BIGINT) AS n_chars
      FROM tok t JOIN vocab v ON v.word = t.tok
      WHERE t.tok <> ''
      GROUP BY t.source
    )
    SELECT source, n_words, n_subwords, n_chars,
           CAST((1000 * n_chars) // n_subwords AS BIGINT) AS chars_per_subword_permille
    FROM per_source ORDER BY source"""
    )


@query("q208_bpe_apply", _bpe_apply_oracle_sql(_BPE_ITERS))
def q208(spark, sf_dir):
    """Tokenizer INFERENCE at corpus scale: apply q202's learned
    merges and report per-source subword statistics (the
    chars-per-token compression ratio a tokenizer owner tracks). The
    production-shaped factorization: merges are applied to the
    DISTINCT-WORD dictionary only (vocab-sized work), and the corpus
    pass is a token -> dictionary equi-join — tokenizing 100 TB never
    re-runs merge replaces per occurrence. The oracle replays
    training AND application bit-for-bit (same chained CTEs as q202
    plus the join rollup).

    100 TB shape: one token-grain shuffle for the dictionary join
    (broadcast when the vocab fits, as here) + a source-grain rollup;
    merge application is O(|vocab| x iters) regardless of corpus
    size."""
    docs = t(spark, sf_dir, "documents")
    w = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    cur = w.select("word", "freq", F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("seq"))
    cur = cur.persist()
    try:
        for _ in range(_BPE_ITERS):
            pairs = (
                cur.withColumn("arr", F.split("seq", " "))
                .filter(F.size("arr") >= 2)
                .select(
                    "freq",
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(arr) - 2),"
                            " i -> concat(element_at(arr, i + 1), ' ', element_at(arr, i + 2)))"
                        )
                    ).alias("pr"),
                )
                .groupBy("pr")
                .agg(F.sum("freq").cast("long").alias("c"))
            )
            best = pairs.orderBy(F.desc("c"), "pr").limit(1).collect()[0]
            pat = F.lit(f" {best['pr']} ")
            rep = F.lit(f" {best['pr'].replace(' ', '')} ")
            padded = F.concat(F.lit(" "), F.col("seq"), F.lit(" "))
            nxt = cur.select(
                "word", "freq", F.trim(F.replace(F.replace(padded, pat, rep), pat, rep)).alias("seq")
            ).persist()
            nxt.count()
            cur.unpersist()
            cur = nxt
        vocab = cur.select("word", F.size(F.split("seq", " ")).cast("long").alias("n_subwords"))
        tok = (
            docs.select("source", F.explode(tokens("text")).alias("word"))
            .filter(F.col("word") != "")
        )
        out = (
            tok.join(F.broadcast(vocab), "word")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_words"),
                F.sum("n_subwords").cast("long").alias("n_subwords"),
                F.sum(F.length("word")).cast("long").alias("n_chars"),
            )
            .select(
                "source",
                "n_words",
                "n_subwords",
                "n_chars",
                F.expr("CAST((1000 * n_chars) DIV n_subwords AS BIGINT)").alias(
                    "chars_per_subword_permille"
                ),
            )
            .orderBy("source")
        )
        out = out.localCheckpoint()  # materialize before unpersisting the vocab chain
        return out
    finally:
        cur.unpersist()


# =====================================================================
# q203 — quality-filter funnel with per-rule rejection attribution
# =====================================================================

_STOPWORDS = ("the", "a", "of", "to", "and", "in")


# =====================================================================
# sdk12 — write-audit-publish through the engine, under the oracle gate
# =====================================================================


@query(
    "sdk12_wap_publish",
    """
    SELECT c_custkey, c_nationkey FROM customer WHERE c_acctbal > 0
    """,
)
def sdk12(spark, sf_dir):
    """Write-audit-publish under the driver gate: stage the FULL
    customer slice as a non-active version, prove a bad staging is
    rejected by its audit (negative balances violate the ad-hoc
    check and the active pointer never moves), then publish the good
    staging and read the table back. The oracle states the expected
    FINAL table contents — so the driver hash-checks that audits
    gate exactly what goes live.

    100 TB shape: staging reuses the ordinary versioned write (no
    copy), the audit is one aggregate job over the staged files, the
    flip is O(1) metadata."""
    from .node.node import Table
    from .queries import _temp_engine

    eng = _temp_engine(spark)
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    with eng.node_context("w", outputs={"out": "cust_wap"}):
        tbl = Table("out", "w")
        bad = tbl.write_staged(c)  # full slice incl. negative balances
        try:
            tbl.publish(bad.version_id, checks={"bal_pos": "c_acctbal > 0"})
            raise AssertionError("audit should have rejected the staging")
        except CheckConstraintViolation:
            tbl.abandon(bad.version_id)
        good = tbl.write_staged(c.filter(F.col("c_acctbal") > 0))
        tbl.publish(good.version_id, checks={"bal_pos": "c_acctbal > 0"})
    with eng.node_context("r", inputs={"in": "cust_wap"}):
        return Table("in", "r").read_spark().select("c_custkey", "c_nationkey")


# =====================================================================
# q207 — Benford first-digit audit (synthetic/fabricated-data screen)
# =====================================================================

# permille of log10(1 + 1/d), d = 1..9 — the Benford expectation as
# integer constants shared verbatim by both engines (no float log)
_BENFORD_PERMILLE = (301, 176, 125, 97, 79, 67, 58, 51, 46)


@query(
    "q207_benford_audit",
    f"""
    WITH cents AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS c FROM orders WHERE o_totalprice > 0
    ),
    digit AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS d FROM cents
    ),
    obs AS (SELECT d, CAST(count(*) AS BIGINT) AS n FROM digit GROUP BY d),
    total AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs),
    exp AS (
      SELECT CAST(i + 1 AS BIGINT) AS d, CAST(p AS BIGINT) AS expected_permille
      FROM (SELECT unnest({list(_BENFORD_PERMILLE)}) AS p,
                   generate_subscripts({list(_BENFORD_PERMILLE)}, 1) - 1 AS i)
    )
    SELECT e.d AS digit,
           COALESCE(o.n, 0) AS n,
           CAST((1000 * COALESCE(o.n, 0)) // t.t AS BIGINT) AS observed_permille,
           e.expected_permille,
           abs(CAST((1000 * COALESCE(o.n, 0)) // t.t AS BIGINT) - e.expected_permille) AS abs_dev_permille
    FROM exp e LEFT JOIN obs o ON o.d = e.d CROSS JOIN total t
    ORDER BY digit
    """,
)
def q207(spark, sf_dir):
    """Benford first-digit conformance audit (Benford 1938; the
    standard fabricated-data screen, increasingly used to flag
    SYNTHETIC records in training corpora): first significant digit of
    the order amount in exact cents, observed permille share vs the
    Benford expectation. The expectation enters as the shared integer
    constants permille(log10(1+1/d)) — no float log anywhere, so the
    audit (including every deviation) is hash-checked bit-for-bit.

    100 TB shape: one scan -> 9-group hash-agg (map-side combine on a
    9-value domain) -> broadcast of the scalar total and the 9-row
    expectation table. The audit is O(scan) with O(1) state — the
    cheapest possible data-quality pass, and the deviation column is
    the alert threshold a pipeline monitors."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = o.select(
        F.substring(F.expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"), 1, 1)
        .cast("long")
        .alias("d")
    )
    obs = digit.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n"))
    total = obs.agg(F.sum("n").cast("long").alias("t"))
    exp = spark.createDataFrame(
        [(i + 1, p) for i, p in enumerate(_BENFORD_PERMILLE)], "d long, expected_permille long"
    )
    return (
        exp.join(obs, "d", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("d").alias("digit"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.expr("CAST((1000 * coalesce(n, 0)) DIV t AS BIGINT)").alias("observed_permille"),
            "expected_permille",
            F.expr(
                "abs(CAST((1000 * coalesce(n, 0)) DIV t AS BIGINT) - expected_permille)"
            ).alias("abs_dev_permille"),
        )
        .orderBy("digit")
    )


# =====================================================================
# q206 — prefix-filter set-similarity self-join (PPJoin-family)
# =====================================================================


@query(
    "q206_prefix_filter_join",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS sh
      FROM toks, unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
      WHERE len(w) >= 3
    ),
    dfreq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    cap AS (SELECT greatest(20, count(*) // 250) AS c FROM documents),
    ordered AS (
      SELECT sh.doc_id, sh.sh, d.df,
             row_number() OVER (PARTITION BY sh.doc_id ORDER BY d.df, sh.sh) AS pos
      FROM sh JOIN dfreq d ON d.sh = sh.sh
    ),
    prefix AS (
      SELECT o.doc_id, o.sh
      FROM ordered o JOIN sizes s ON s.doc_id = o.doc_id
      WHERE o.pos <= s.n_sh - ((s.n_sh + 1) // 2) + 1
        AND o.df <= (SELECT c FROM cap)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
    ),
    docsh AS (SELECT doc_id, list(sh ORDER BY sh) AS shl FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, sa.n_sh AS na, sb.n_sh AS nb,
             CAST(len(list_intersect(da.shl, db.shl)) AS BIGINT) AS n_inter
      FROM cand c
      JOIN sizes sa ON sa.doc_id = c.id_a
      JOIN sizes sb ON sb.doc_id = c.id_b AND 2 * least(sa.n_sh, sb.n_sh) >= greatest(sa.n_sh, sb.n_sh)
      JOIN docsh da ON da.doc_id = c.id_a
      JOIN docsh db ON db.doc_id = c.id_b
    )
    SELECT i.id_a, i.id_b, i.n_inter,
           i.na + i.nb - i.n_inter AS n_union,
           CAST((1000 * i.n_inter) // (i.na + i.nb - i.n_inter) AS BIGINT) AS jac_millis
    FROM inter i
    WHERE 2 * i.n_inter >= i.na + i.nb - i.n_inter
    ORDER BY id_a, id_b
    """,
)
def q206(spark, sf_dir):
    """Prefix-filter set-similarity self-join (the PPJoin/AllPairs
    family, Bayardo et al. 2007 / Xiao et al. 2008): the OTHER
    bucketed route to near-dup pairs besides LSH banding (q35) and the
    capped inverted index (q63). Each doc's shingles are ordered
    rarest-first (global df, ties lexicographic) and only the first
    L = n - ceil(t*n) + 1 ever enter the candidate join; for Jaccard
    t=1/2, J(x,y) >= t implies overlap >= ceil(t*max(|x|,|y|)), which
    forces the two prefixes to share an element — so candidate
    generation is COMPLETE while hot shingles (which live at the END
    of the ordering) never generate pairs. Verification is exact
    set-intersection on candidates; the threshold compare
    2*inter >= union is integer cross-multiplication.

    100 TB shape: the prefix join's fan-out is bounded by RARE-token
    df (the quadratic blowup lives in frequent tokens, all excluded
    from prefixes — the same reason q63 needs max_df). On OPEN-
    vocabulary corpora that alone bounds candidates without dropping
    any true pair; on bounded-vocabulary corpora (this fixture's
    31-word domain — the adversarial case, SCALE.md §65) even prefix
    positions hold hot shingles and candidates go quadratic, so the
    prefix index additionally drops postings with df > max(20,
    n_docs/250) — q63's corpus-scaled budget, replayed by the oracle
    via the same scalar subquery. The cap bounds per-posting fan-out
    at df^2 with df = O(n_docs) only through the corpus-proportional
    term; completeness then holds for pairs connected by at least one
    sub-cap prefix token (exact on open vocabularies, where prefix
    tokens are rare by construction). The per-doc ordering window is
    PARTITIONED by doc. Everything else is hash-aggs and equi-joins;
    the oracle replays candidates AND verification bit-for-bit."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    n_docs = docs.count()
    cap = max(20, n_docs // 250)
    # single evaluation: the shingle set feeds df/sizes/prefix and both
    # verification arrays (q189 lesson — without this each consumer
    # re-runs the explode+distinct). localCheckpoint, NOT persist
    # (r7, measured): the EAGER checkpoint hands the planner a
    # materialized RDD with real size stats, so the dfreq/sizes joins
    # broadcast — a lazy persist left unfilled-cache estimates and the
    # whole chain degraded to sort-merge joins (q206 6.8 -> 24.8 s,
    # q259 2.9 -> 7.2 s)
    sh = distinct_shingles(docs, "doc_id", "text", 3).localCheckpoint()
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    w = Window.partitionBy("id").orderBy("df", "sh")
    ordered = sh.join(dfreq, "sh").withColumn("pos", F.row_number().over(w))
    # n_sh rides on the prefix rows so the PPJoin size filter runs
    # INSIDE the candidate self-join, before the distinct (r7 opt —
    # same rebase as q259: shrink the pair set before the shuffle,
    # two join-backs gone; same predicate on the same sizes, so the
    # surviving pairs and na/nb values are identical)
    prefix = (
        ordered.join(sizes, "id")
        .filter(
            (F.col("pos") <= F.col("n_sh") - F.expr("(n_sh + 1) DIV 2") + 1)
            & (F.col("df") <= F.lit(cap))
        )
        .select("id", "sh", "n_sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (2 * F.least("a.n_sh", "b.n_sh") >= F.greatest("a.n_sh", "b.n_sh")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .distinct()
    )
    # verification at CANDIDATE grain, not (candidate x shingle):
    # per-doc shingle sets ride as arrays and each candidate pair
    # costs ONE array_intersect — the (cand JOIN sh JOIN sh) form
    # shuffles |cand| x |doc shingles| rows and is what actually
    # melts on bounded-vocabulary corpora (48.5M candidates at the
    # 100x tier). The PPJoin size filter (2*min >= max for t=1/2)
    # dropped provably-failing pairs inside the candidate join above.
    docsh = sh.groupBy("id").agg(F.sort_array(F.collect_list("sh")).alias("shl"))
    da = docsh.select(F.col("id").alias("id_a"), F.col("shl").alias("sha"))
    db = docsh.select(F.col("id").alias("id_b"), F.col("shl").alias("shb"))
    inter = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "na",
            "nb",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias("n_inter"),
        )
    )
    return (
        inter.filter(2 * F.col("n_inter") >= F.col("na") + F.col("nb") - F.col("n_inter"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            F.expr("CAST((1000 * n_inter) DIV (na + nb - n_inter) AS BIGINT)").alias("jac_millis"),
        )
        .orderBy("id_a", "id_b")
    )


# =====================================================================
# q259 — prefix-filter join at t=0.8 (prefix-budget scale control)
# =====================================================================


@query(
    "q259_prefix_filter_t80",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(w[CAST(i AS BIGINT):CAST(i + 2 AS BIGINT)], ' ') AS sh
      FROM toks, unnest(range(1, greatest(len(w) - 1, 1))) AS u(i)
      WHERE len(w) >= 3
    ),
    dfreq AS (SELECT sh, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY sh),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id),
    ordered AS (
      SELECT sh.doc_id, sh.sh,
             row_number() OVER (PARTITION BY sh.doc_id ORDER BY d.df, sh.sh) AS pos
      FROM sh JOIN dfreq d ON d.sh = sh.sh
    ),
    prefix AS (
      SELECT o.doc_id, o.sh
      FROM ordered o JOIN sizes s ON s.doc_id = o.doc_id
      WHERE o.pos <= s.n_sh - ((4 * s.n_sh + 4) // 5) + 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM prefix a JOIN prefix b ON a.sh = b.sh AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.id_a, c.id_b, CAST(count(*) AS BIGINT) AS n_inter
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b AND y.sh = x.sh
      GROUP BY c.id_a, c.id_b
    )
    SELECT i.id_a, i.id_b, i.n_inter,
           sa.n_sh + sb.n_sh - i.n_inter AS n_union,
           CAST((1000 * i.n_inter) // (sa.n_sh + sb.n_sh - i.n_inter) AS BIGINT) AS jac_millis
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE 9 * i.n_inter >= 4 * (sa.n_sh + sb.n_sh)
    ORDER BY id_a, id_b
    """,
)
def q259(spark, sf_dir):
    """Prefix-filter join at threshold t=0.8 — the prefix-BUDGET
    control the sf1 sweep showed matters (SCALE.md §65): at t=1/2 the
    prefix is ~n/2 shingles per doc and a bounded-vocabulary corpus
    explodes the candidate join; at t=0.8 the prefix is
    L = n - ceil(0.8n) + 1 ≈ n/5 — a 5x smaller index, ~25x fewer
    candidate pairs, with completeness INTACT for J >= 0.8 (two sets
    that similar must share a rarest-L-prefix element, Xiao et al.
    2008). The near-dup retrieval target for training-data curation is
    usually 0.8-0.9, so the tight threshold is also the realistic one.
    Verification stays exact and integer (J >= 4/5 <=> 9*inter >=
    4*(|a|+|b|)); the oracle replays candidates AND verdicts. This is
    the query that stays tractable at sf1 where q206's t=1/2 prefix
    grinds — the measured pair is the design evidence."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    # the shingle set feeds FIVE consumers (df, sizes, prefix ordering,
    # both verification sides) with different prunings — without a
    # single evaluation each consumer re-runs the explode+distinct
    # (q189 lesson: 10 scans / 19 exchanges; rebased: 0 / 12).
    # localCheckpoint, NOT persist (r7, measured — see q206): the
    # eager checkpoint's real size stats keep the dfreq/sizes joins
    # broadcast; a lazy persist degraded the chain to sort-merge
    # joins (2.9 -> 7.2 s)
    sh = distinct_shingles(docs, "doc_id", "text", 3).localCheckpoint()
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).cast("long").alias("df"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("n_sh"))
    w = Window.partitionBy("id").orderBy("df", "sh")
    ordered = sh.join(dfreq, "sh").withColumn("pos", F.row_number().over(w))
    # n_sh RIDES on the prefix rows (the cutoff join already pays for
    # it), so the PPJoin size filter runs INSIDE the candidate
    # self-join — before the distinct — instead of via two join-backs
    # after it (r7 opt, guide §2.3: shrink the pair set before the
    # shuffle). Measured at sf0.1: 122k raw / 119k distinct pairs
    # unfiltered vs 46k raw / 43.5k distinct with the filter pushed
    # down — a 60% smaller distinct exchange and two joins gone; the
    # filter is the SAME predicate on the same sizes, so the surviving
    # pairs (and na/nb values) are identical.
    prefix = (
        ordered.join(sizes, "id")
        .filter(F.col("pos") <= F.col("n_sh") - F.expr("(4 * n_sh + 4) DIV 5") + 1)
        .select("id", "sh", "n_sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.id") < F.col("b.id"))
            & (5 * F.least("a.n_sh", "b.n_sh") >= 4 * F.greatest("a.n_sh", "b.n_sh")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .distinct()
    )
    # verification at CANDIDATE grain (same rebase as q206): per-doc
    # shingle arrays ride to each pair for ONE array_intersect — the
    # (cand JOIN sh JOIN sh) form shuffles |cand| x |doc shingles|
    # rows (the sf1 sweep measured it at 226s vs q206's 119s). The
    # t=0.8 size filter (5*min >= 4*max; J <= min/max) dropped the
    # provably-failing pairs above; a zero-intersection pair cannot
    # pass 9*0 >= 4*(na+nb), so output matches the oracle's
    # inner-join form exactly.
    docsh = sh.groupBy("id").agg(F.sort_array(F.collect_list("sh")).alias("shl"))
    da = docsh.select(F.col("id").alias("id_a"), F.col("shl").alias("sha"))
    db = docsh.select(F.col("id").alias("id_b"), F.col("shl").alias("shb"))
    inter = (
        cand.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            "na",
            "nb",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias("n_inter"),
        )
    )
    return (
        inter.filter(9 * F.col("n_inter") >= 4 * (F.col("na") + F.col("nb")))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            (F.col("na") + F.col("nb") - F.col("n_inter")).alias("n_union"),
            F.expr("CAST((1000 * n_inter) DIV (na + nb - n_inter) AS BIGINT)").alias("jac_millis"),
        )
        .orderBy("id_a", "id_b")
    )


# =====================================================================
# sdk11 — incremental dedup vs the historical corpus, THROUGH the engine
# =====================================================================


@query(
    "sdk11_incremental_dedup",
    """
    WITH fp AS (
      SELECT doc_id, source,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    ),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE source = 'src0'),
    batch AS (SELECT doc_id, fingerprint FROM fp WHERE source <> 'src0'),
    intra AS (
      SELECT doc_id, fingerprint FROM (
        SELECT doc_id, fingerprint,
               row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rk
        FROM batch
      ) WHERE rk = 1
    )
    SELECT i.doc_id, i.fingerprint
    FROM intra i LEFT JOIN hist h ON h.fingerprint = i.fingerprint
    WHERE h.fingerprint IS NULL
    """,
)
def sdk11(spark, sf_dir):
    """operators/dedup.incremental_dedup under the oracle gate (it was
    pytest-only before): the production-shaped streaming-corpus exact
    dedup, where the fingerprint state lives in a versioned engine
    table instead of a rescan of all prior raw text. Phase 1 lands the
    src0 'historical' slice (populating the seen-table); phase 2 runs
    the rest of the corpus as the NEW batch — survivors are batch docs
    that dup neither an intra-batch doc (min-id wins) nor any
    historical fingerprint. The oracle states both phases in closed
    form over md5 fingerprints (bit-identical across engines).

    100 TB shape: every step is batch-proportional except the one
    anti-join probe against seen (16-byte fingerprints, upsert keyed
    on fingerprint = idempotent retry); the dedup window is PARTITIONED
    by fingerprint — no global sort anywhere."""
    from .operators.dedup import incremental_dedup
    from .queries import _temp_engine

    docs = t(spark, sf_dir, "documents")
    eng = _temp_engine(spark)
    from .node.node import Table

    with eng.node_context("dedup", outputs={"out": "seen_fps"}):
        seen = Table("out", "w")
        seen.init(unique_on="fingerprint")
        incremental_dedup(docs.filter(F.col("source") == "src0"), seen)
        survivors = incremental_dedup(docs.filter(F.col("source") != "src0"), seen)
        return survivors.select("doc_id", "fingerprint")


# =====================================================================
# q205 — MMR diversified re-ranking over a retrieval shortlist
# =====================================================================

_MMR_POOL = 20
_MMR_K = 4


def _mmr_oracle_sql(pool: int, k: int) -> str:
    """Chained-CTE replay of the greedy MMR loop: sel{j} picks the
    argmax of rel - max_sim_to_selected among the remaining shortlist,
    ties to the smaller vec_id."""
    base = f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[], x -> CAST(round(x * 1000000, 0) AS BIGINT)) AS ei
      FROM embeddings
    ),
    ep AS (
      SELECT vec_id, CAST(i AS INT) AS d, ei[CAST(i AS INT)] AS v
      FROM e, unnest(range(1, 65)) AS u(i)
    ),
    qv AS (SELECT d, v AS qv FROM ep WHERE vec_id = 0),
    dots AS (
      SELECT ep.vec_id, CAST(sum(ep.v * qv.qv) AS BIGINT) AS rel
      FROM ep JOIN qv ON qv.d = ep.d
      WHERE ep.vec_id <> 0 GROUP BY 1
    ),
    sl AS (SELECT vec_id, rel FROM dots ORDER BY rel DESC, vec_id LIMIT {pool}),
    slv AS (SELECT ep.vec_id, ep.d, ep.v FROM ep JOIN sl ON sl.vec_id = ep.vec_id),
    sims AS (
      SELECT a.vec_id AS a, b.vec_id AS b, CAST(sum(a.v * b.v) AS BIGINT) AS dot
      FROM slv a JOIN slv b ON a.d = b.d AND a.vec_id <> b.vec_id
      GROUP BY 1, 2
    ),
    sel1 AS (
      SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel, CAST(0 AS BIGINT) AS redundancy, rel AS score
      FROM sl ORDER BY rel DESC, vec_id LIMIT 1
    )"""
    stages = []
    for j in range(2, k + 1):
        prev = " UNION ALL ".join(f"SELECT vec_id FROM sel{i}" for i in range(1, j))
        stages.append(
            f""",
    sel{j} AS (
      SELECT CAST({j} AS BIGINT) AS rank, c.vec_id, c.rel,
             max(p.dot) AS redundancy, c.rel - max(p.dot) AS score
      FROM sl c JOIN sims p ON p.a = c.vec_id AND p.b IN ({prev})
      WHERE c.vec_id NOT IN ({prev})
      GROUP BY c.vec_id, c.rel
      ORDER BY score DESC, c.vec_id LIMIT 1
    )"""
        )
    final = " UNION ALL ".join(
        f"SELECT rank, vec_id, rel, redundancy, score FROM sel{j}" for j in range(1, k + 1)
    )
    return base + "".join(stages) + "\n    " + final + "\n    ORDER BY rank"


@query("q205_mmr_rerank", _mmr_oracle_sql(_MMR_POOL, _MMR_K))
def q205(spark, sf_dir):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): greedily pick k=4 results that balance relevance to
    the query (vec_id 0, q76/q199 convention) against redundancy with
    the already-selected set — score = rel - max_sim_to_selected
    (lambda = 1/2, both terms in the same micro-unit integer dot
    scale, so the greedy argmax is integer-exact and the oracle
    replays the LOOP as chained CTEs, like q202).

    100 TB shape: the distributed work is the relevance scan (integer
    dots against a broadcast query vector) and a TakeOrdered shortlist
    of 20; MMR then runs on the POOL-side (pairwise sims of a
    20-row set = 400 dots — computed in one bounded self-join, greedy
    selection on the driver over the collected 400-row matrix, the
    only honest way to express a sequential greedy loop over a
    shortlist). This is the production MMR shape: rerank a bounded
    candidate list, never the corpus."""
    emb = t(spark, sf_dir, "embeddings")
    ep = emb.select(
        "vec_id", F.posexplode(F.expr("transform(embedding, x -> CAST(round(x * 1000000) AS BIGINT))"))
    ).select("vec_id", F.col("pos").alias("d"), F.col("col").alias("v"))
    qv = ep.filter(F.col("vec_id") == 0).select("d", F.col("v").alias("qv"))
    dots = (
        ep.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), "d")
        .groupBy("vec_id")
        .agg(F.sum(F.col("v") * F.col("qv")).cast("long").alias("rel"))
    )
    sl = dots.orderBy(F.desc("rel"), "vec_id").limit(_MMR_POOL)
    slv = ep.join(F.broadcast(sl.select("vec_id")), "vec_id")
    a, b = slv.alias("a"), slv.alias("b")
    sims = (
        a.join(b, (F.col("a.d") == F.col("b.d")) & (F.col("a.vec_id") != F.col("b.vec_id")))
        .groupBy(F.col("a.vec_id").alias("pa"), F.col("b.vec_id").alias("pb"))
        .agg(F.sum(F.col("a.v") * F.col("b.v")).cast("long").alias("dot"))
    )
    pool = {r["vec_id"]: r["rel"] for r in sl.collect()}
    sim = {(r["pa"], r["pb"]): r["dot"] for r in sims.collect()}
    selected: list[tuple] = []
    chosen: list[int] = []
    for rank in range(1, _MMR_K + 1):
        best = None
        for vid, rel in pool.items():
            if vid in chosen:
                continue
            red = max((sim[(vid, s)] for s in chosen), default=0)
            score = rel - red if chosen else rel
            key = (score, -vid)
            if best is None or key > best[0]:
                best = (key, vid, rel, red, score)
        _, vid, rel, red, score = best
        chosen.append(vid)
        selected.append((rank, vid, rel, red, score))
    return spark.createDataFrame(
        selected, "rank bigint, vec_id bigint, rel bigint, redundancy bigint, score bigint"
    ).orderBy("rank")


_PMI_MIN_SUPPORT = 5


@query(
    "q204_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT string_split_regex(trim(text), '\\s+') AS w FROM documents
    ),
    bg AS (
      SELECT w[i + 1] AS w1, w[i + 2] AS w2
      FROM toks, unnest(range(len(w) - 1)) AS u(i)
      WHERE len(w) >= 2
    ),
    cab AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_ab FROM bg GROUP BY w1, w2),
    uni AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents) x
      WHERE token <> '' GROUP BY 1
    ),
    n AS (SELECT CAST(sum(c_ab) AS BIGINT) AS n_bigrams FROM cab)
    SELECT cab.w1, cab.w2, cab.c_ab,
           ua.c AS c_a, ub.c AS c_b,
           CAST(length(bin(cab.c_ab)) + length(bin(n.n_bigrams))
                - length(bin(ua.c)) - length(bin(ub.c)) AS BIGINT) AS pmi2
    FROM cab
    JOIN uni ua ON ua.token = cab.w1
    JOIN uni ub ON ub.token = cab.w2
    CROSS JOIN n
    WHERE cab.c_ab >= {_PMI_MIN_SUPPORT}
    ORDER BY pmi2 DESC, c_ab DESC, w1, w2 LIMIT 30
    """,
)
def q204(spark, sf_dir):
    """PMI collocation mining (Church & Hanks 1990): rank adjacent
    word pairs by pointwise mutual information — the phrase-detection
    pass a tokenizer/embedding pipeline runs to promote multi-word
    units. Integer PMI proxy: floor-log2 additivity,
    pmi2 = flog2(c_ab) + flog2(N) - flog2(c_a) - flog2(c_b), each term
    via length(bin(x)) — every operand stays an independent bigint at
    ANY corpus size (no c_ab*N product to overflow, no float log), so
    the oracle hash-checks the ranking exactly.

    100 TB shape: two token-grain hash-aggs (bigram tf and unigram tf,
    both map-side combining on Zipf domains), the corpus scalar N
    broadcasts, and the two dictionary joins are hash joins on the
    bounded vocab — the same dataflow as q198's BM25 statistics. The
    min-support filter (c_ab >= {_PMI_MIN_SUPPORT}) prunes the
    long-tail pairs BEFORE the joins; top-30 is a TakeOrdered."""
    docs = t(spark, sf_dir, "documents")
    bg = (
        docs.select(F.explode(word_shingles("text", 2)).alias("bg"))
        .select(
            F.split("bg", " ").getItem(0).alias("w1"),
            F.split("bg", " ").getItem(1).alias("w2"),
        )
    )
    cab_all = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c_ab"))
    cab = cab_all.filter(F.col("c_ab") >= _PMI_MIN_SUPPORT)
    uni = (
        docs.select(F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    # N is over ALL bigrams (pre-support-filter), matching the oracle:
    # sum(max(len-1, 0)) from a narrow scan — no second explode, no
    # second pair aggregation (identity: each doc has len-1 bigrams)
    n = docs.select(
        F.greatest(F.size(tokens("text")) - 1, F.lit(0)).alias("nb")
    ).agg(F.sum("nb").cast("long").alias("n_bigrams"))
    ua = uni.select(F.col("token").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("token").alias("w2"), F.col("c").alias("c_b"))
    out = (
        cab.join(ua, "w1")
        .join(ub, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_ab",
            "c_a",
            "c_b",
            (
                F.length(F.expr("bin(c_ab)"))
                + F.length(F.expr("bin(n_bigrams)"))
                - F.length(F.expr("bin(c_a)"))
                - F.length(F.expr("bin(c_b)"))
            ).cast("long").alias("pmi2"),
        )
    )
    return out.orderBy(F.desc("pmi2"), F.desc("c_ab"), "w1", "w2").limit(30)


@query(
    "q203_filter_funnel",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents
    ),
    tf AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS c
      FROM tok WHERE token <> '' GROUP BY doc_id, token
    ),
    st AS (
      SELECT doc_id,
             sum(c) AS n_tokens,
             sum(c * length(token)) AS sum_len,
             count(*) AS n_distinct,
             max(c) AS max_tf,
             sum(CASE WHEN token IN {str(_STOPWORDS)} THEN c ELSE 0 END) AS n_stop
      FROM tf GROUP BY doc_id
    ),
    b AS (
      SELECT doc_id,
             (n_tokens >= 30) AS b1,
             (2 * n_tokens <= sum_len AND sum_len <= 8 * n_tokens) AS b2,
             (n_stop >= 2) AS b3,
             (10 * n_distinct >= 3 * n_tokens) AS b4,
             (5 * max_tf <= n_tokens) AS b5
      FROM st
    )
    SELECT CAST(1 AS BIGINT) AS rule_idx, 'min_word_count' AS rule,
           CAST(count(*) AS BIGINT) AS n_in,
           CAST(sum(CASE WHEN NOT b1 THEN 1 ELSE 0 END) AS BIGINT) AS n_fail FROM b
    UNION ALL
    SELECT 2, 'mean_word_len', CAST(sum(CASE WHEN b1 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b1 AND NOT b2 THEN 1 ELSE 0 END) AS BIGINT) FROM b
    UNION ALL
    SELECT 3, 'stopword_floor', CAST(sum(CASE WHEN b1 AND b2 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b1 AND b2 AND NOT b3 THEN 1 ELSE 0 END) AS BIGINT) FROM b
    UNION ALL
    SELECT 4, 'distinct_ratio', CAST(sum(CASE WHEN b1 AND b2 AND b3 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b1 AND b2 AND b3 AND NOT b4 THEN 1 ELSE 0 END) AS BIGINT) FROM b
    UNION ALL
    SELECT 5, 'top_token_share', CAST(sum(CASE WHEN b1 AND b2 AND b3 AND b4 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(sum(CASE WHEN b1 AND b2 AND b3 AND b4 AND NOT b5 THEN 1 ELSE 0 END) AS BIGINT) FROM b
    ORDER BY rule_idx
    """,
)
def q203(spark, sf_dir):
    """Quality-filter funnel (Gopher/C4-style rule battery, Rae et al.
    2021 §A1.1) with per-rule attribution: rules run in a declared
    order and each funnel row reports how many docs REACHED that rule
    and how many it rejected — the operational report a curation
    pipeline ships alongside its keep/drop verdict (q78 emits the
    verdict; this emits the accounting that explains corpus shrinkage).

    Every threshold is an integer cross-multiplication (mean word
    length 2<=len<=8 as 2n<=sum_len<=8n, distinct ratio >=0.3 as
    10d>=3n, top-token share <=20% as 5max<=n) — no float division
    anywhere, so the oracle matches exactly.

    100 TB shape: one token-grain hash-agg (tf) + one doc-grain
    rollup; the funnel itself is a single 10-column aggregate over
    doc-grain booleans unpivoted to 5 rows — no shuffle beyond the two
    aggs, no window."""
    docs = t(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    stops = ", ".join(f"'{s}'" for s in _STOPWORDS)
    st = tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(F.col("c") * F.length("token")).alias("sum_len"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("max_tf"),
        F.sum(F.expr(f"CASE WHEN token IN ({stops}) THEN c ELSE 0 END")).alias("n_stop"),
    )
    b = st.select(
        (F.col("n_tokens") >= 30).alias("b1"),
        ((2 * F.col("n_tokens") <= F.col("sum_len")) & (F.col("sum_len") <= 8 * F.col("n_tokens"))).alias("b2"),
        (F.col("n_stop") >= 2).alias("b3"),
        (10 * F.col("n_distinct") >= 3 * F.col("n_tokens")).alias("b4"),
        (5 * F.col("max_tf") <= F.col("n_tokens")).alias("b5"),
    )
    agg = b.agg(
        F.count(F.lit(1)).cast("long").alias("in1"),
        F.sum(F.when(~F.col("b1"), 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("b1"), 1).otherwise(0)).cast("long").alias("in2"),
        F.sum(F.when(F.col("b1") & ~F.col("b2"), 1).otherwise(0)).cast("long").alias("f2"),
        F.sum(F.when(F.col("b1") & F.col("b2"), 1).otherwise(0)).cast("long").alias("in3"),
        F.sum(F.when(F.col("b1") & F.col("b2") & ~F.col("b3"), 1).otherwise(0)).cast("long").alias("f3"),
        F.sum(F.when(F.col("b1") & F.col("b2") & F.col("b3"), 1).otherwise(0)).cast("long").alias("in4"),
        F.sum(F.when(F.col("b1") & F.col("b2") & F.col("b3") & ~F.col("b4"), 1).otherwise(0)).cast("long").alias("f4"),
        F.sum(F.when(F.col("b1") & F.col("b2") & F.col("b3") & F.col("b4"), 1).otherwise(0)).cast("long").alias("in5"),
        F.sum(F.when(F.col("b1") & F.col("b2") & F.col("b3") & F.col("b4") & ~F.col("b5"), 1).otherwise(0)).cast("long").alias("f5"),
    )
    rules = ["min_word_count", "mean_word_len", "stopword_floor", "distinct_ratio", "top_token_share"]
    stack = ", ".join(f"{k + 1}L, '{r}', in{k + 1}, f{k + 1}" for k, r in enumerate(rules))
    return agg.select(
        F.expr(f"stack(5, {stack}) AS (rule_idx, rule, n_in, n_fail)")
    ).orderBy("rule_idx")
