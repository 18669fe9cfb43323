"""Operator-library unit tests on small deterministic data (the fixture
parity suite covers cross-engine equivalence; these cover semantics)."""
from pyspark.sql import functions as F

from patterns_devkit_spark.operators import asof as asof_ops
from patterns_devkit_spark.operators import dedup as dedup_ops
from patterns_devkit_spark.operators import multimodal as mm_ops
from patterns_devkit_spark.operators import similarity as sim_ops
from patterns_devkit_spark.operators import text as text_ops
from patterns_devkit_spark.operators import windows as win_ops


def test_exact_dedup_keeps_min_id(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello  world"), (3, "different")], ["doc_id", "text"]
    )
    out = {r["keep_id"]: r["dup_count"] for r in dedup_ops.exact_dedup(df).collect()}
    # whitespace-normalized: docs 1+2 are the same fingerprint
    assert out == {1: 2, 3: 1}


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x"), (3, "z z z z z")], ["doc_id", "text"]
    )
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in dedup_ops.ngram_jaccard_pairs(df, n=3).collect()}
    # doc1 shingles {abc,bcd,cde}, doc2 {abc,bcd,cdx}: J = 2/4
    assert pairs == {(1, 2): 0.5}


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [(1, "spark table join merge sort"), (2, "spark table join merge batch"), (3, "completely unrelated words here now")],
        ["doc_id", "text"],
    )
    sh = {r["doc_id"]: r["simhash"] for r in dedup_ops.simhash(df).collect()}
    mask = (1 << 64) - 1  # signed->unsigned before popcount

    def ham(a, b):
        return bin((a ^ b) & mask).count("1")

    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])  # near-dup is closer


def test_cosine_topk_exact(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]), (4, [0.5, 0.5])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = sim_ops.cosine_topk(df, df.filter(F.col("vec_id") == 1), k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in out.collect()]
    assert got == [(2, 1), (4, 2)]


def test_asof_join_semantics(spark):
    left = spark.createDataFrame([(1, 10, 100.0), (1, 20, 200.0), (2, 15, 150.0)], ["k", "lts", "lv"])
    right = spark.createDataFrame([(1, 5, "a"), (1, 10, "b"), (1, 18, "c"), (2, 99, "z")], ["k", "rts", "tag"])
    out = asof_ops.asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts", right_cols=["tag"], tiebreak="rts")
    got = {(r["k"], r["lts"]): r["asof_tag"] for r in out.collect()}
    # <= semantics: lts=10 matches rts=10; k=2 has no preceding right row
    assert got == {(1, 10): "b", (1, 20): "c", (2, 15): None}


def test_sessionize_gap(spark):
    base = 1700000000
    rows = [(1, i, base + off) for i, off in enumerate([0, 60, 120, 4000, 4060])]
    df = spark.createDataFrame(rows, ["user_id", "event_id", "epoch"]).select(
        "user_id", "event_id", F.col("epoch").cast("timestamp").alias("ts"), F.lit(1.0).alias("value")
    )
    out = win_ops.sessionize(df, "ts", "user_id", gap_minutes=30)
    sizes = sorted(r["n_events"] for r in out.collect())
    assert sizes == [2, 3]  # 4000s gap splits the sessions


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog of a house"), (2, "der hund und die katze ist da"), (3, "xyzzy plugh")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text_ops.lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], ["doc_id", "text"])
    out = df.select(text_ops.word_shingles("text", 3).alias("sh")).collect()[0]["sh"]
    assert out == []  # shorter than n -> empty, not a descending-sequence bug


def test_distinct_shingles_hashed_same_sets(spark):
    """hashed=True keys shingles by xxhash64 long instead of the n-word
    string (r7 opt: shuffle 8 bytes, not ~50). Equality structure must
    be preserved: identical per-doc distinct counts and identical
    cross-doc sharing relations (collisions are ~2^-32-improbable and
    would fail this test's exact-count asserts)."""
    from patterns_devkit_spark.operators.det_hash import distinct_shingles

    rows = [
        (1, "a b c d e"),
        (2, "a b c d e"),  # exact dup of 1
        (3, "x y z a b c"),  # shares 'a b c' with 1/2
        (4, "p q r s"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    s = distinct_shingles(df, "doc_id", "text", 3)
    h = distinct_shingles(df, "doc_id", "text", 3, hashed=True)
    assert dict(h.dtypes)["sh"] == "bigint"
    per_doc_s = {r["id"]: r["n"] for r in s.groupBy("id").count().withColumnRenamed("count", "n").collect()}
    per_doc_h = {r["id"]: r["n"] for r in h.groupBy("id").count().withColumnRenamed("count", "n").collect()}
    assert per_doc_s == per_doc_h
    # shared-window relation (the q91 shape): same (per-doc shared counts)
    def shared_counts(frame):
        from pyspark.sql import functions as F
        shared = frame.groupBy("sh").count().filter("count >= 2").select("sh")
        j = frame.join(shared, "sh", "left_semi").groupBy("id").count()
        return {r["id"]: r["count"] for r in j.collect()}

    assert shared_counts(s) == shared_counts(h)


def test_multimodal_binarize_extract(spark):
    df = spark.createDataFrame([(1, "abc", "s1"), (2, "", "s2")], ["doc_id", "text", "source"])
    media = mm_ops.binarize(df, "doc_id", "text", "source", mime="text/plain")
    assert dict(media.dtypes)["payload"] == "binary"
    feats = {r["media_id"]: r for r in mm_ops.extract_features(media).collect()}
    assert feats[1]["n_bytes"] == 3
    assert feats[1]["feat_head"] == [97, 98, 99]
    assert abs(feats[1]["feat_mean"] - 98.0) < 1e-9
    assert feats[2]["feat_mean"] == 0.0


def test_minhash_lsh_finds_near_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base.replace("today", "tomorrow")), (3, "completely different content with other words entirely for testing purposes")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = dedup_ops.minhash_lsh_dedup(df, threshold=0.5, n=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got and (1, 3) not in got


def test_salted_join_equals_plain_join(spark):
    from patterns_devkit_spark.operators import skew

    fact = spark.createDataFrame([(k, i) for i in range(50) for k in ([1] * 5 + [2])], ["k", "v"])
    dim = spark.createDataFrame([(1, "hot"), (2, "cold"), (3, "unused")], ["k", "name"])
    plain = fact.join(dim, ["k"]).groupBy("k", "name").count()
    salted = skew.salted_join(fact, dim, ["k"], salt=4).groupBy("k", "name").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_two_phase_agg_equals_direct(spark):
    from pyspark.sql import functions as F

    from patterns_devkit_spark.operators import skew

    df = spark.createDataFrame([(i % 3, float(i)) for i in range(300)], ["k", "v"])
    direct = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    two = {
        (r["k"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in skew.salted_two_phase_agg(
            df, ["k"], {"n": "count", "s": "sum:v", "mn": "min:v", "mx": "max:v"}, salt=8
        ).collect()
    }
    assert direct == two


def test_connected_components_clusters(spark):
    from patterns_devkit_spark.operators.graph_algo import connected_components, dedup_clusters

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 1)], ["id_a", "id_b"]
    )
    comps = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 6, 9, 42]], ["doc_id"])
    labeled = {r["doc_id"]: (r["cluster_id"], r["is_canonical"]) for r in dedup_clusters(docs, edges).collect()}
    assert labeled[42] == (42, True)  # isolated doc is its own cluster
    assert labeled[2] == (1, False) and labeled[1] == (1, True)
    assert sum(1 for c, canon in labeled.values() if canon) == 3  # clusters {1..},{5,6},{42}


def test_ngram_jaccard_max_df_drops_hot_shingles(spark):
    from patterns_devkit_spark.operators.dedup import ngram_jaccard_pairs

    # 6 docs sharing one hot shingle; only docs 1,2 truly near-dup
    rows = [(1, "a b c d e"), (2, "a b c d f")] + [(i, f"a b c x{i} y{i}") for i in range(3, 7)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    full = ngram_jaccard_pairs(df, n=3).count()
    capped = ngram_jaccard_pairs(df, n=3, max_df=3).count()
    assert capped < full  # hot shingle 'a b c' (df=6) no longer pairs everyone
    kept = {(r["id_a"], r["id_b"]) for r in ngram_jaccard_pairs(df, n=3, max_df=3).collect()}
    assert (1, 2) in kept  # the real near-dup pair survives via 'b c d'


def test_asof_join_pandas_equals_window_form(spark, sf_dir):
    from patterns_devkit_spark.operators.asof import asof_join, asof_join_pandas
    from patterns_devkit_spark.queries import t

    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = e.filter(F.col("event_type") == "view").select("user_id", "ts", "event_id")
    a = asof_join(purchases, views, ["user_id"], "ts", "ts", ["event_id"], tiebreak="event_id")
    b = asof_join_pandas(purchases, views, ["user_id"], "ts", "ts", ["event_id"])
    ra = {(r["event_id"], r["asof_event_id"]) for r in a.collect()}
    rb = {(r["event_id"], r["asof_event_id"]) for r in b.collect()}
    assert ra == rb and len(ra) > 0


def test_ann_lsh_recall_against_exact(spark, sf_dir):
    """Approximation quality gate: LSH ANN recall@5 vs exact cosine
    top-5 on the fixture must clear a floor (documents approximation
    honestly instead of hiding it)."""
    from patterns_devkit_spark.operators.similarity import ann_lsh, cosine_topk
    from patterns_devkit_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(emb, queries_df, k=5)
    approx = ann_lsh(emb, queries_df, k=5)
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, f"ANN recall@5 too low: {recall:.2f}"


def test_ann_hyperplane_recall_against_exact(spark, sf_dir):
    """Deterministic hyperplane-LSH ANN: recall@5 vs exact cosine top-5
    must clear a floor (cross-engine correctness is covered by the q38
    oracle; this gates that the buckets are actually *useful*)."""
    from patterns_devkit_spark.operators.det_hash import ann_hyperplane
    from patterns_devkit_spark.operators.similarity import cosine_topk
    from patterns_devkit_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    ex = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries_df, k=5).collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in ann_hyperplane(emb, queries_df, k=5).collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.6, f"hyperplane ANN recall@5 too low: {recall:.2f}"


def test_minhash_det_agreement_tracks_jaccard(spark):
    """Deterministic MinHash banding finds the true near-dup pair and
    scores it higher than unrelated candidate pairs."""
    from patterns_devkit_spark.operators.det_hash import minhash_lsh_pairs_det

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(1, base), (2, base.replace("today", "tomorrow")),
            (3, "completely different content with other words entirely for testing purposes")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["n_sig_agree"] for r in minhash_lsh_pairs_det(df, n=2).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 16  # >=half the 32 hashes agree
    assert all(v < got[(1, 2)] for k, v in got.items() if k != (1, 2))


def test_simhash_md5_variant_orders_like_xxhash(spark):
    """The cross-engine md5 hash family preserves SimHash's semantic:
    near-dup docs land closer in Hamming space than unrelated docs."""
    from patterns_devkit_spark.operators.det_hash import md5_long

    df = spark.createDataFrame(
        [(1, "spark table join merge sort"), (2, "spark table join merge batch"),
         (3, "completely unrelated words here now")],
        ["doc_id", "text"],
    )
    sh = {
        r["doc_id"]: r["simhash"]
        for r in dedup_ops.simhash(df, bits=32, hash_fn=lambda c: md5_long(c, hex_digits=8)).collect()
    }

    def ham(a, b):
        return bin((a ^ b) & 0xFFFFFFFF).count("1")

    assert ham(sh[1], sh[2]) < ham(sh[1], sh[3])


def test_asof_join_string_tiebreak_deterministic(spark):
    """Equal right_ts ties resolve by the tiebreak column in its NATIVE
    type (a double cast would null out strings and leave the winner to
    chance) — matching asof_join_pandas' lexical sort."""
    left = spark.createDataFrame([(1, 10)], ["k", "lts"])
    right = spark.createDataFrame([(1, 10, "a"), (1, 10, "b")], ["k", "rts", "tag"])
    out = asof_ops.asof_join(left, right, ["k"], "lts", "rts", ["tag"], tiebreak="tag")
    assert out.collect()[0]["asof_tag"] == "b"


def test_twolevel_paths_bit_identical(spark, sf_dir):
    """The bounded-k closure fast path and the distributed cogroup path
    of the two-level coarse quantizer must produce IDENTICAL
    assignments and centroid models — the oracle replays ONE algorithm,
    so the gate (small_k) may only ever change the plan, never a row."""
    import numpy as np

    from patterns_devkit_spark.operators.det_hash import (
        _isqrt_super,
        quantized_embedding,
        twolevel_coarse,
    )
    from patterns_devkit_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    e = (
        emb.select(F.col("vec_id").alias("id"), quantized_embedding("embedding").alias("ei"))
        .repartition(4)
        .localCheckpoint()
    )
    n = e.count()
    k = max(16, n // 64)
    seeds = e.orderBy("id").limit(k).select(F.col("id").alias("cid"), "ei")
    super_rows = e.orderBy("id").limit(_isqrt_super(k)).collect()
    SC = np.array([r["ei"] for r in super_rows], dtype="int64")
    sgids = np.array([r["id"] for r in super_rows], dtype="int64")
    mean = "CAST(floor(sum(s) / sum(n)) AS BIGINT)"
    outs = []
    for small_k in (k, 0):  # force each path
        a2, cent1, _c1_local = twolevel_coarse(
            e, seeds, SC, sgids, mean_sql=mean, k=k, small_k=small_k,
            emit_residuals=True,
        )
        outs.append(
            (
                sorted((r["id"], r["cid"], tuple(r["ei"])) for r in a2.collect()),
                sorted((r["cid"], r["d"], r["c"]) for r in cent1.collect()),
            )
        )
    assert outs[0][0] == outs[1][0], "assignments/residuals diverge between paths"
    assert outs[0][1] == outs[1][1], "centroid models diverge between paths"


def test_ivf_topk_recall_against_exact(spark, sf_dir):
    """IVF probing must actually find near neighbors (cross-engine
    correctness is covered by the q66 oracle; this gates usefulness)."""
    from patterns_devkit_spark.operators.det_hash import ivf_topk
    from patterns_devkit_spark.operators.similarity import cosine_topk
    from patterns_devkit_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    ex = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries_df, k=5).collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in ivf_topk(emb, queries_df, k=5).collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, f"IVF recall@5 too low: {recall:.2f}"


def test_pq_topk_recall_against_exact(spark, sf_dir):
    """PQ's ADC shortlist must surface the true near neighbors before
    the exact re-rank (cross-engine correctness is the q263 oracle;
    this gates usefulness of the compressed representation)."""
    from patterns_devkit_spark.operators.det_hash import pq_topk
    from patterns_devkit_spark.operators.similarity import cosine_topk
    from patterns_devkit_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    ex = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries_df, k=5).collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in pq_topk(emb, queries_df, k=5).collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.4, f"PQ recall@5 too low: {recall:.2f}"


def test_ivfpq_topk_recall_against_exact(spark, sf_dir):
    """IVF-PQ's probed-cell + compressed-residual shortlist must still
    surface true near neighbors (q264's oracle covers cross-engine
    equality; this gates usefulness of the composed approximation)."""
    from patterns_devkit_spark.operators.det_hash import ivfpq_topk
    from patterns_devkit_spark.operators.similarity import cosine_topk
    from patterns_devkit_spark.queries import t

    emb = t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 20)
    ex = {(r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, queries_df, k=5).collect()}
    ap = {(r["query_id"], r["neighbor_id"]) for r in ivfpq_topk(emb, queries_df, k=5).collect()}
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.3, f"IVF-PQ recall@5 too low: {recall:.2f}"


def test_bottomk_fingerprint_identity_and_stability(spark):
    """Identical texts share the exact sketch; different texts don't."""
    from patterns_devkit_spark.operators.text import bottomk_fingerprint

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "an entirely different document body here")],
        ["doc_id", "text"],
    )
    rows = bottomk_fingerprint(df).collect()
    sk = {}
    for r in rows:
        sk.setdefault(r["doc_id"], []).append((r["rk"], r["gram_hash"]))
    assert sorted(sk[1]) == sorted(sk[2])  # identical docs -> identical sketch
    assert sorted(sk[1]) != sorted(sk[3])
    assert len(sk[1]) == 4 and [rk for rk, _ in sorted(sk[1])] == [1, 2, 3, 4]


def test_frame_sample_boundaries(spark):
    """Frame slicing: stride, last-partial-frame size, and per-frame
    hashes are exact."""
    import hashlib

    df = spark.createDataFrame([(1, "a" * 600, "s")], ["doc_id", "text", "source"])
    media = mm_ops.binarize(df, "doc_id", "text", "source")
    rows = {r["frame_idx"]: r for r in mm_ops.frame_sample(media, frame_size=256, every_nth=2).collect()}
    # frames 0,1,2 exist (600 bytes -> 3 frames); stride 2 keeps 0 and 2
    assert sorted(rows) == [0, 2]
    assert rows[0]["frame_bytes"] == 256
    assert rows[2]["frame_bytes"] == 600 - 512
    assert rows[0]["frame_hash"] == hashlib.md5(b"a" * 256).hexdigest()
    assert rows[2]["frame_hash"] == hashlib.md5(b"a" * 88).hexdigest()


def test_thumbnail_decimation_exact(spark):
    """Stride decimation: exact byte selection + hash; null payloads
    are skipped, not emitted."""
    import hashlib

    df = spark.createDataFrame([(1, "abcdefghij", "s"), (2, "xy", "s")], ["doc_id", "text", "source"])
    media = mm_ops.binarize(df, "doc_id", "text", "source")
    rows = {r["media_id"]: r for r in mm_ops.thumbnail(media, stride=3).collect()}
    assert bytes(rows[1]["thumb"]) == b"adgj" and rows[1]["thumb_bytes"] == 4
    assert rows[1]["thumb_md5"] == hashlib.md5(b"adgj").hexdigest()
    assert bytes(rows[2]["thumb"]) == b"x"


def test_windowed_energy_overlap(spark):
    """Hop/window accounting: overlapping windows, short-tail window,
    exact integer energies."""
    df = spark.createDataFrame([(1, "a" * 10, "s")], ["doc_id", "text", "source"])
    media = mm_ops.binarize(df, "doc_id", "text", "source")
    rows = {r["win_idx"]: r for r in mm_ops.windowed_energy(media, win=8, hop=4).collect()}
    # 10 bytes, win 8, hop 4 -> wins at 0 (8 bytes) and 1 (6 bytes)
    assert sorted(rows) == [0, 1]
    assert rows[0]["win_bytes"] == 8 and rows[0]["energy"] == 8 * 97
    assert rows[1]["win_bytes"] == 6 and rows[1]["energy"] == 6 * 97


# ---------------------------------------------------------------------
# Z-order clustering (operators/layout.py)
# ---------------------------------------------------------------------


def test_zvalue_morton_bit_layout(spark):
    from patterns_devkit_spark.operators.layout import zvalue

    df = spark.createDataFrame(
        [(1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3)], "x long, y long"
    )
    got = {(r["x"], r["y"]): r["z"] for r in df.select("x", "y", zvalue(["x", "y"]).alias("z")).collect()}
    # classic Morton: x occupies even bit positions, y odd
    assert got == {(1, 0): 1, (0, 1): 2, (1, 1): 3, (2, 0): 4, (0, 2): 8, (3, 3): 15}


def test_zvalue_quadrant_ordering(spark):
    """Every point with both coords < 2^k z-sorts before any point with
    either coord >= 2^k — the prefix property that gives BOTH columns
    min/max pruning locality."""
    from patterns_devkit_spark.operators.layout import zvalue

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long").select("x", "y", zvalue(["x", "y"]).alias("z"))
    rows = df.collect()
    inner_max = max(r["z"] for r in rows if r["x"] < 4 and r["y"] < 4)
    outer_min = min(r["z"] for r in rows if r["x"] >= 4 or r["y"] >= 4)
    assert inner_max < outer_min


def test_cluster_by_writes_z_sorted_files(engine):
    """Table.init(cluster_by=...) -> version files are physically
    z-ordered (checked via pyarrow, which preserves row order)."""
    import glob
    import random

    import pyarrow.parquet as pq

    from patterns_devkit_spark import Table

    grid = [{"a": x, "b": y, "v": x * 100 + y} for x in range(32) for y in range(32)]
    random.Random(7).shuffle(grid)
    with engine.node_context("w", outputs={"out": "zt"}):
        t = Table("out", "w")
        t.init(cluster_by=["a", "b"])
        t.replace(grid)
        storage = t.get_active_version().storage
        files = glob.glob(f"{storage}/**/*.parquet", recursive=True)
        assert files

        def z(a, b):
            out = 0
            for i in range(31):
                out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
            return out

        for f in files:
            tb = pq.read_table(f, columns=["a", "b"])
            zs = [z(a, b) for a, b in zip(tb.column("a").to_pylist(), tb.column("b").to_pylist())]
            assert zs == sorted(zs), "rows within a clustered file must be z-ordered"
        # data intact
        assert sorted(r["v"] for r in t.read()) == sorted(g["v"] for g in grid)


def test_recluster_produces_disjoint_z_ranges(engine):
    """Table.recluster(): range shuffle on the z-key -> file-level
    z-ranges are disjoint, so min/max stats prune whole files on any
    clustered column."""
    import glob
    import random

    import pyarrow.parquet as pq

    from patterns_devkit_spark import Table

    grid = [{"a": x, "b": y} for x in range(64) for y in range(64)]
    random.Random(3).shuffle(grid)
    with engine.node_context("w", outputs={"out": "zr"}):
        t = Table("out", "w")
        t.init(cluster_by=["a", "b"])
        # write WITHOUT layout first (simulate decay: plain append path
        # sorts within whatever partitions the buffer produced)
        t.replace(grid)
        av = t.recluster(num_files=4)
        files = sorted(glob.glob(f"{av.storage}/**/*.parquet", recursive=True))
        assert len(files) >= 2

        def z(a, b):
            out = 0
            for i in range(31):
                out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
            return out

        ranges = []
        for f in files:
            tb = pq.read_table(f, columns=["a", "b"])
            zs = [z(a, b) for a, b in zip(tb.column("a").to_pylist(), tb.column("b").to_pylist())]
            assert zs == sorted(zs)
            ranges.append((min(zs), max(zs)))
        ranges.sort()
        for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, "file z-ranges must be disjoint after recluster"
        assert t.record_count == 64 * 64


def test_asof_join_tolerance_bounds_lookback(spark):
    """tolerance: a match older than the bound nulls out (pandas
    merge_asof semantics), both in the window form and the cogrouped
    pandas form."""
    import pandas as pd

    from patterns_devkit_spark.operators.asof import asof_join, asof_join_pandas

    left = spark.createDataFrame(
        [("k", 100), ("k", 205), ("k", 500)], "key string, lts long"
    )
    right = spark.createDataFrame(
        [("k", 90, "a"), ("k", 200, "b")], "key string, rts long, val string"
    )
    got = {
        r["lts"]: r["asof_val"]
        for r in asof_join(left, right, ["key"], "lts", "rts", ["val"], tolerance=50).collect()
    }
    # 100: match rts=90 (age 10 <= 50); 205: rts=200 (age 5); 500: rts=200 too old -> null
    assert got == {100: "a", 205: "b", 500: None}

    # timestamp + interval-string variant must agree with merge_asof
    from datetime import datetime as _dt

    lts = spark.createDataFrame(
        [("k", _dt(2024, 1, 1, 0, 1, 40)), ("k", _dt(2024, 1, 1, 0, 3, 25)),
         ("k", _dt(2024, 1, 1, 0, 8, 20))],
        "key string, lts timestamp",
    )
    rts = spark.createDataFrame(
        [("k", _dt(2024, 1, 1, 0, 1, 30), "a"), ("k", _dt(2024, 1, 1, 0, 3, 20), "b")],
        "key string, rts timestamp, val string",
    )
    got_w = {
        str(r["lts"]): r["asof_val"]
        for r in asof_join(lts, rts, ["key"], "lts", "rts", ["val"], tolerance="50 seconds").collect()
    }
    got_p = {
        str(r["lts"]): r["asof_val"]
        for r in asof_join_pandas(
            lts, rts, ["key"], "lts", "rts", ["val"], tolerance=pd.Timedelta(seconds=50)
        ).collect()
    }
    assert got_w == got_p == {
        "2024-01-01 00:01:40": "a",
        "2024-01-01 00:03:25": "b",
        "2024-01-01 00:08:20": None,
    }


def test_linkage_best_match_maxby_equals_window(spark):
    """best_match law: the max_by hash-aggregate fast path (numeric
    tiebreak) must select EXACTLY the rows the row_number window
    selects — max score per id, smallest tiebreak on ties, threshold
    applied after selection."""
    from pyspark.sql import functions as F

    from patterns_devkit_spark.operators.linkage import best_match

    rows = [
        # id, cand, score  (id 1: tie at 50 -> cand 3 wins; id 2: below threshold)
        (1, 7, 50), (1, 3, 50), (1, 9, 10),
        (2, 1, 20), (2, 2, 19),
        (3, 5, 80), (3, 4, 79),
    ]
    scored = spark.createDataFrame(rows, "b_id long, p long, score long")
    fast = best_match(scored, "b_id", "score", tiebreak="p", threshold=30)
    got = {(r["b_id"], r["p"], r["score"]) for r in fast.collect()}
    assert got == {(1, 3, 50), (3, 5, 80)}
    # string tiebreak falls back to the window path; same semantics
    s2 = scored.withColumn("p", F.col("p").cast("string"))
    slow = best_match(s2, "b_id", "score", tiebreak="p", threshold=30)
    got2 = {(r["b_id"], r["p"], r["score"]) for r in slow.collect()}
    assert got2 == {(1, "3", 50), (3, "5", 80)}


def test_linkage_union_pair_keys_dedups(spark):
    from patterns_devkit_spark.operators.linkage import union_pair_keys

    p1 = spark.createDataFrame([(1, 10), (2, 20)], "a long, b long")
    p2 = spark.createDataFrame([(1, 10), (3, 30)], "a long, b long")
    got = sorted((r["a"], r["b"]) for r in union_pair_keys([p1, p2]).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
