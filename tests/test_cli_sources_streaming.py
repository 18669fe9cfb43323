"""CLI command surface (§2.7), file sources, Structured Streaming mode."""
import json
import os
import subprocess
import sys

from pyspark.sql import functions as F
from pyspark.sql import types as T

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(args, cwd):
    env = {**os.environ, "PYTHONPATH": REPO}
    return subprocess.run(
        [sys.executable, "-m", "patterns_devkit_spark.cli", *args],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=60,
    )


def test_cli_create_upload_flow(tmp_path):
    r = run_cli(["create", "app", "myapp"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    app = tmp_path / "myapp"
    r = run_cli(["create", "node", "step1.py"], str(app))
    assert r.returncode == 0, r.stderr
    r = run_cli(["create", "node", "agg.sql"], str(app))
    assert r.returncode == 0, r.stderr
    assert (app / "step1.py").exists() and (app / "agg.sql").exists()
    # fresh sql node has no output binding -> upload reports the error
    r = run_cli(["upload"], str(app))
    assert r.returncode == 1
    assert "sql node requires an output store" in r.stdout
    # fix the graph: bind the sql node
    import yaml

    doc = yaml.safe_load((app / "graph.yml").read_text())
    for fn in doc["functions"]:
        if fn.get("node_file") == "agg.sql":
            fn["outputs"] = {"result": "out_t"}
    doc["stores"] = [{"table": "out_t"}]
    (app / "graph.yml").write_text(yaml.safe_dump(doc, sort_keys=False))
    (app / "agg.sql").write_text("SELECT 1 AS one")
    r = run_cli(["upload"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    assert "2 nodes OK" in r.stdout
    # upload assigned ids in place (reference id round-trip behavior)
    doc = yaml.safe_load((app / "graph.yml").read_text())
    assert all("id" in fn for fn in doc["functions"])
    r = run_cli(["list", "nodes"], str(app))
    assert r.returncode == 0 and "agg.sql" in r.stdout


def test_cli_config(tmp_path):
    r = run_cli(["--warehouse", str(tmp_path / "wh"), "config"], str(tmp_path))
    assert json.loads(r.stdout)["warehouse"].endswith("wh")


def test_import_files_csv_and_append(engine, tmp_path):
    from patterns_devkit_spark.sources.files import import_files

    csv = tmp_path / "data.csv"
    csv.write_text("id,name\n1,a\n2,b\n")
    n = import_files(engine, "imported", str(csv), format="csv", mode="replace")
    assert n == 2
    csv2 = tmp_path / "more.csv"
    csv2.write_text("id,name\n3,c\n")
    n = import_files(engine, "imported", str(csv2), format="csv", mode="append")
    assert n == 3
    with engine.node_context("r", inputs={"in": "imported"}):
        from patterns_devkit_spark import Table

        assert sorted(r["id"] for r in Table("in", "r").read()) == [1, 2, 3]


def test_import_media_binary(engine, tmp_path):
    from patterns_devkit_spark.sources.files import import_media_dir

    (tmp_path / "m").mkdir()
    (tmp_path / "m" / "a.bin").write_bytes(b"\x01\x02\x03")
    n = import_media_dir(engine, "media", str(tmp_path / "m"))
    assert n == 1
    with engine.node_context("r", inputs={"in": "media"}):
        from patterns_devkit_spark import Table

        row = Table("in", "r").read()[0]
        assert row["length"] == 3 and bytes(row["content"]) == b"\x01\x02\x03"


def test_streaming_spool_to_engine_table(engine, tmp_path):
    """readStream json spool -> watermarked window agg -> foreachBatch
    into an engine table (versioned, evented)."""
    from patterns_devkit_spark.streaming.streams import spool_stream, windowed_counts, write_stream_to_table

    spool = tmp_path / "spool"
    spool.mkdir()
    rows = [
        {"ts": "2024-01-01T00:01:00", "user_id": 1, "kind": "a"},
        {"ts": "2024-01-01T00:02:00", "user_id": 1, "kind": "b"},
        {"ts": "2024-01-01T00:07:00", "user_id": 2, "kind": "a"},
    ]
    (spool / "batch1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
    stream = spool_stream(engine, str(spool), schema)
    assert stream.isStreaming
    agg = windowed_counts(stream, "ts", "5 minutes", "10 minutes")
    q = write_stream_to_table(engine, agg, "win_counts", str(tmp_path / "ckpt"), output_mode="complete")
    q.awaitTermination(120)
    with engine.node_context("r", inputs={"in": "win_counts"}):
        from patterns_devkit_spark import Table

        got = {(str(r["window_start"]), r["n_events"]) for r in Table("in", "r").read()}
        assert got == {("2024-01-01 00:00:00", 2), ("2024-01-01 00:05:00", 1)}


def test_streaming_session_window(engine, tmp_path):
    from patterns_devkit_spark.streaming.streams import session_counts, spool_stream, write_stream_to_table

    spool = tmp_path / "spool2"
    spool.mkdir()
    rows = [
        {"ts": "2024-01-01T00:00:00", "user_id": 1},
        {"ts": "2024-01-01T00:10:00", "user_id": 1},
        {"ts": "2024-01-01T02:00:00", "user_id": 1},
    ]
    (spool / "b.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("user_id", T.LongType())]
    )
    stream = spool_stream(engine, str(spool), schema)
    agg = session_counts(stream, "ts", "30 minutes", "user_id")
    q = write_stream_to_table(engine, agg, "sessions", str(tmp_path / "ckpt2"), output_mode="complete")
    q.awaitTermination(120)
    with engine.node_context("r", inputs={"in": "sessions"}):
        from patterns_devkit_spark import Table

        sizes = sorted(r["n_events"] for r in Table("in", "r").read())
        assert sizes == [1, 2]  # 2h gap splits sessions


def test_cli_secret_and_vacuum(tmp_path):
    wh = str(tmp_path / "wh")
    r = run_cli(["--warehouse", wh, "secret", "set", "db", "host=h", "user=u"], str(tmp_path))
    assert r.returncode == 0
    r = run_cli(["--warehouse", wh, "secret", "get", "db"], str(tmp_path))
    assert json.loads(r.stdout) == {"host": "h", "user": "u"}
    r = run_cli(["--warehouse", wh, "vacuum"], str(tmp_path))
    assert r.returncode == 0 and "vacuum complete" in r.stdout


def test_cli_upload_download_diff_cycle(tmp_path):
    wh = str(tmp_path / "wh")
    run_cli(["create", "app", "cycleapp"], str(tmp_path))
    app = tmp_path / "cycleapp"
    (app / "graph.yml").write_text(
        "title: Cycle\nslug: cycleapp\n# a comment that must survive\nfunctions:\n  - node_file: n1.py\nstores: []\n"
    )
    (app / "n1.py").write_text("from patterns import Table\n")
    r = run_cli(["--warehouse", wh, "upload"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    # comment survived the id-assignment rewrite
    text = (app / "graph.yml").read_text()
    assert "# a comment that must survive" in text and "id: " in text
    # no local changes yet
    r = run_cli(["--warehouse", wh, "diff"], str(app))
    assert "no changes" in r.stdout
    # mutate and diff
    (app / "n1.py").write_text("from patterns import Table, State\n")
    r = run_cli(["--warehouse", wh, "diff"], str(app))
    assert "local/n1.py" in r.stdout and "+from patterns import Table, State" in r.stdout
    # download the registered (pre-mutation) copy elsewhere
    r = run_cli(["--warehouse", wh, "download", "cycleapp", "restored"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "restored" / "n1.py").read_text() == "from patterns import Table\n"
    # per-file overwrite protection (reference FileOverwriteError
    # semantics): identical re-download is an idempotent no-op ...
    r = run_cli(["--warehouse", wh, "download", "cycleapp", "restored"], str(tmp_path))
    assert r.returncode == 0, r.stderr
    # ... but a locally-EDITED file refuses to be clobbered
    (tmp_path / "restored" / "n1.py").write_text("# local edit\n")
    r = run_cli(["--warehouse", wh, "download", "cycleapp", "restored"], str(tmp_path))
    assert r.returncode == 1 and "use --force" in r.stderr
    # --force clobbers as asked
    r = run_cli(["--warehouse", wh, "download", "cycleapp", "restored", "--force"], str(tmp_path))
    assert r.returncode == 0
    assert (tmp_path / "restored" / "n1.py").read_text() == "from patterns import Table\n"


def test_cli_trigger_runs_node_on_spark(tmp_path):
    """Manual trigger (reference `patterns trigger NODE`): CLI executes
    the node against the warehouse; `list tables` shows the write."""
    wh = str(tmp_path / "wh")
    app = tmp_path / "trigapp"
    app.mkdir()
    (app / "graph.yml").write_text(
        "functions:\n  - node_file: gen.py\n    id: gen00001\n    outputs: {out: nums}\nstores:\n  - table: nums\n"
    )
    (app / "gen.py").write_text(
        "from patterns import Table\nTable('out', 'w').append([{'n': i} for i in range(7)])\n"
    )
    r = run_cli(["--warehouse", wh, "trigger", "gen00001"], str(app))
    assert r.returncode == 0 and "Triggered node gen00001" in r.stdout, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "list", "tables"], str(app))
    assert "nums" in r.stdout and "7" in r.stdout
    r = run_cli(["--warehouse", wh, "list", "tables", "--json"], str(app))
    rows = [json.loads(ln) for ln in r.stdout.strip().splitlines()]
    assert {"name": "nums", "rows": 7} .items() <= {k: rows[0][k] for k in ("name", "rows")}.items()


def test_cli_upload_respects_gitignore(tmp_path):
    wh = str(tmp_path / "wh")
    app = tmp_path / "ignapp"
    app.mkdir()
    (app / "graph.yml").write_text("slug: ignapp\nfunctions: []\nstores: []\n")
    (app / ".gitignore").write_text("secrets.txt\n*.log\n")
    (app / "secrets.txt").write_text("do-not-upload")
    (app / "debug.log").write_text("noise")
    (app / "keep.py").write_text("# kept")
    r = run_cli(["--warehouse", wh, "upload"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    import os
    reg = os.path.join(wh, "apps", "ignapp")
    assert os.path.exists(os.path.join(reg, "keep.py"))
    assert not os.path.exists(os.path.join(reg, "secrets.txt"))
    assert not os.path.exists(os.path.join(reg, "debug.log"))


def test_streaming_dedup_across_restarts(engine, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate keys are dropped within
    a run AND across a checkpointed restart (state survives); first
    occurrence wins."""
    from patterns_devkit_spark.streaming.streams import dedup_stream, spool_stream, write_stream_to_table

    spool = tmp_path / "spool3"
    spool.mkdir()
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.LongType())]
    )
    (spool / "a.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:01:00", "k": 1},
                {"ts": "2024-01-01T00:01:30", "k": 1},  # dup in-batch
                {"ts": "2024-01-01T00:02:00", "k": 2},
            ]
        )
    )
    ckpt = str(tmp_path / "ckpt3")

    def run_once():
        stream = spool_stream(engine, str(spool), schema)
        deduped = dedup_stream(stream, ["k"], "ts", watermark="10 minutes")
        q = write_stream_to_table(engine, deduped, "dedup_sink", ckpt, output_mode="append")
        q.awaitTermination(120)

    run_once()
    # restart with a new file: k=1 again (within watermark) + fresh k=3
    (spool / "b.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:03:00", "k": 1},
                {"ts": "2024-01-01T00:04:00", "k": 3},
            ]
        )
    )
    run_once()
    with engine.node_context("r", inputs={"in": "dedup_sink"}):
        from patterns_devkit_spark import Table

        ks = sorted(r["k"] for r in Table("in", "r").read())
        assert ks == [1, 2, 3]  # each key exactly once, dups dropped


def test_stream_stream_join_time_bound(engine, tmp_path):
    """Watermarked stream-stream join: impressions join clicks within
    5 minutes; a click outside the bound produces no row."""
    from patterns_devkit_spark.streaming.streams import spool_stream, stream_stream_join, write_stream_to_table

    imp_dir, clk_dir = tmp_path / "imp", tmp_path / "clk"
    imp_dir.mkdir(), clk_dir.mkdir()
    (imp_dir / "i.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:00:00", "ad_id": 10},
                {"ts": "2024-01-01T00:00:00", "ad_id": 20},
            ]
        )
    )
    (clk_dir / "c.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"ts": "2024-01-01T00:03:00", "ad_id": 10},  # within 5 min -> joins
                {"ts": "2024-01-01T00:30:00", "ad_id": 20},  # too late -> no join
            ]
        )
    )
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("ad_id", T.LongType())]
    )
    imps = spool_stream(engine, str(imp_dir), schema)
    clks = spool_stream(engine, str(clk_dir), schema).withColumnRenamed("ts", "click_ts")
    joined = stream_stream_join(
        imps, clks, "ad_id", left_ts="ts", right_ts="click_ts", within="5 minutes"
    ).select("l.ad_id", "l.ts", "r.click_ts")
    q = write_stream_to_table(engine, joined, "attrib", str(tmp_path / "ckpt4"), output_mode="append")
    q.awaitTermination(120)
    with engine.node_context("r", inputs={"in": "attrib"}):
        from patterns_devkit_spark import Table

        rows = Table("in", "r").read()
        assert [r["ad_id"] for r in rows] == [10]


def test_streaming_enrich_against_engine_table(engine, tmp_path):
    """Stream-static join: spool events enriched per micro-batch from an
    engine dim table, broadcast side = dim, sink back into the engine."""
    from patterns_devkit_spark import Table
    from patterns_devkit_spark.streaming.streams import enrich_stream, spool_stream, write_stream_to_table

    with engine.node_context("dimload", outputs={"out": "users_dim"}):
        Table("out", "w").replace([{"user_id": 1, "segment": "pro"}, {"user_id": 2, "segment": "free"}])

    spool = tmp_path / "spool_e"
    spool.mkdir()
    rows = [
        {"ts": "2024-01-01T00:01:00", "user_id": 1, "kind": "a"},
        {"ts": "2024-01-01T00:02:00", "user_id": 2, "kind": "b"},
        {"ts": "2024-01-01T00:03:00", "user_id": 3, "kind": "c"},  # no dim row -> null segment
    ]
    (spool / "b1.json").write_text("\n".join(json.dumps(r) for r in rows))
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("kind", T.StringType()),
        ]
    )
    stream = spool_stream(engine, str(spool), schema)
    with engine.node_context("dimread", inputs={"in": "users_dim"}):
        dim = Table("in", "r").read_spark()
    enriched = enrich_stream(stream, dim, on="user_id", how="left")
    assert enriched.isStreaming
    q = write_stream_to_table(
        engine, enriched, "events_enriched", str(tmp_path / "ckpt_e"), output_mode="append"
    )
    q.awaitTermination(120)
    with engine.node_context("r2", inputs={"in": "events_enriched"}):
        got = {(r["user_id"], r["kind"], r["segment"]) for r in Table("in", "r").read()}
        assert got == {(1, "a", "pro"), (2, "b", "free"), (3, "c", None)}


def test_streaming_incremental_dedup_sink(engine, tmp_path):
    """Curation ingest: spool stream -> foreachBatch incremental exact
    dedup against a versioned fingerprint table -> survivors appended.
    Replayed/duplicate text across micro-batches must land exactly
    once."""
    from patterns_devkit_spark import Table
    from patterns_devkit_spark.operators.dedup import incremental_dedup
    from patterns_devkit_spark.streaming.streams import spool_stream

    spool = tmp_path / "spool2"
    spool.mkdir()
    (spool / "b1.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 1, "text": "alpha beta"},
                {"doc_id": 2, "text": "alpha  beta"},
                {"doc_id": 3, "text": "gamma"},
            ]
        )
    )
    (spool / "b2.json").write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"doc_id": 4, "text": "ALPHA beta"},
                {"doc_id": 5, "text": "delta"},
            ]
        )
    )
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    stream = spool_stream(engine, str(spool), schema)

    def sink(batch_df, batch_id):
        with engine.node_context(
            "curate", outputs={"seen": "fp_corpus", "out": "survivors"}
        ):
            seen = Table("seen", "w")
            if not seen.exists:
                seen.init(
                    schema={"fingerprint": "text", "keep_id": "bigint"},
                    unique_on="fingerprint",
                )
            surv = incremental_dedup(batch_df, seen)
            out = Table("out", "w")
            out.append(surv.select("doc_id", "text"))
            out.flush()

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    with engine.node_context("r", inputs={"in": "survivors"}):
        ids = sorted(r["doc_id"] for r in Table("in", "r").read())
    # alpha-beta keeps its first id, gamma and delta survive once
    assert 3 in ids and 5 in ids
    assert len([i for i in ids if i in (1, 2, 4)]) == 1
    assert len(ids) == 3


def test_cli_list_breadth(tmp_path):
    """VERDICT r3 item 7 (reference commands/list.py:27-98): `list
    webhooks/secrets/views/matviews` with tabular output and --json
    JSON Lines; empty kinds print 'No <kind> found'."""
    wh = str(tmp_path / "wh")
    app = tmp_path / "listapp"
    app.mkdir()
    (app / "graph.yml").write_text(
        "functions:\n  - webhook: hook_t\n    id: wh000001\nstores:\n  - table: hook_t\n"
    )
    # secrets + a view via their CLI commands
    r = run_cli(["--warehouse", wh, "secret", "set", "apikey", "token=tok", "url=u"], str(app))
    assert r.returncode == 0, r.stdout + r.stderr
    r = run_cli(["--warehouse", wh, "list", "secrets"], str(app))
    assert r.returncode == 0 and "apikey" in r.stdout and "2" in r.stdout
    # values must never appear in a listing
    assert "tok" not in r.stdout.split() and "u" not in r.stdout.split()
    r = run_cli(["--warehouse", wh, "list", "secrets", "--json"], str(app))
    row = json.loads(r.stdout.strip().splitlines()[0])
    assert row == {"name": "apikey", "n_keys": 2}

    r = run_cli(["--warehouse", wh, "list", "webhooks"], str(app))
    assert r.returncode == 0 and "hook_t" in r.stdout and "wh000001" in r.stdout

    r = run_cli(["--warehouse", wh, "list", "views"], str(app))
    assert r.returncode == 0 and "No views found" in r.stdout
    r = run_cli(["--warehouse", wh, "list", "matviews"], str(app))
    assert r.returncode == 0 and "No matviews found" in r.stdout


def test_cli_optimize_and_branch(tmp_path):
    # seed a warehouse through the SDK, then drive the maintenance and
    # branch commands through the real CLI process
    import tempfile

    wh = str(tmp_path / "wh")
    seed = (
        "import sys\n"
        "from patterns_devkit_spark import Engine, Table\n"
        "eng = Engine(sys.argv[1])\n"
        "with eng.node_context('n', outputs={'out': 't'}):\n"
        "    t = Table('out', 'w'); t.init(unique_on=['id'])\n"
        "    t.append(eng.spark.createDataFrame([(i, i) for i in range(12)], 'id long, v long').coalesce(3)); t.flush()\n"
        "    t.delete_where('id < 2', vectorized=True)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", seed, wh],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stderr[-800:]
    r = run_cli(["--warehouse", wh, "optimize", "t", "--purge"], str(tmp_path))
    assert "purged 2 masked row images" in r.stdout
    r = run_cli(["--warehouse", wh, "optimize", "t", "--target-files", "1"], str(tmp_path))
    assert "compacted" in r.stdout
    r = run_cli(["--warehouse", wh, "branch", "t", "hotfix"], str(tmp_path))
    assert "created branch" in r.stdout
    r = run_cli(["--warehouse", wh, "branch", "t"], str(tmp_path))
    assert "hotfix" in r.stdout
    # main moves while the branch lives; --sync catches the branch up
    move = (
        "import sys\n"
        "from patterns_devkit_spark import Engine, Table\n"
        "eng = Engine(sys.argv[1])\n"
        "with eng.node_context('n', outputs={'out': 't'}):\n"
        "    t = Table('out', 'w'); t.upsert([{'id': 3, 'v': 333}]); t.flush()\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", move, wh],
        capture_output=True, text=True, cwd=str(tmp_path),
        env={**os.environ, "PYTHONPATH": REPO},
    )
    assert r.returncode == 0, r.stderr[-800:]
    r = run_cli(["--warehouse", wh, "branch", "t", "hotfix", "--sync"], str(tmp_path))
    assert "synced branch" in r.stdout and "1 change rows" in r.stdout
    r = run_cli(["--warehouse", wh, "branch", "t", "hotfix", "--merge"], str(tmp_path))
    assert "merged branch" in r.stdout and "0 change rows" in r.stdout
