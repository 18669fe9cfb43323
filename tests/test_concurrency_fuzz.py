"""Multi-writer crash fuzz (VERDICT r4 item 6): N concurrent
PROCESSES race append-style version commits against one warehouse
while the parent SIGKILLs them at random points — the crash-replay
property test (test_properties) taken cross-process, against the real
commit sections (flock for json, BEGIN IMMEDIATE for sqlite).

Invariants, validated from worker logs + the reopened store:
- the store always reloads cleanly after kill -9 mid-commit (atomic
  tmp+rename / WAL — no torn document);
- CAS linearizability: at most ONE successful compare-and-swap flip
  per base version across all workers (a second writer on the same
  base must get ConcurrentWriteError — the lost-update core);
- the surviving active version is one a worker actually created, and
  its manifest resolves to files present on disk;
- crash orphans (versions whose creator died before the flip or
  between refusal and drop) are swept by normal retention GC.
"""
import os
import random
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import os, random, sys, time
sys.path.insert(0, %(repo)r)
import pyarrow as pa
import pyarrow.parquet as pq
from patterns_devkit_spark.catalog.catalog import Catalog, ConcurrentWriteError

wh, wid, log_path = sys.argv[1], sys.argv[2], sys.argv[3]
os.environ.pop("PDS_CATALOG_BACKEND", None)
cat = Catalog(wh)  # auto-detects the parent's chosen backend
rng = random.Random(os.getpid())
log = open(log_path, "a", buffering=1)
while True:
    try:
        base = cat.get_active_version("t")
        vid = cat.create_new_version("t")
        vdir = cat.version_dir("t", vid)
        pq.write_table(pa.table({"a": [int(wid)]}), os.path.join(vdir, "part-0.parquet"))
        cat.set_manifest("t", vid, ["t/" + vid + "/part-0.parquet"])
        log.write("created " + vid + "\\n")
        try:
            r = rng.random()
            if r < 0.3:
                # batched finalize: count + CAS flip in ONE transaction
                # (the production write-path shape) — a kill mid-batch
                # must atomically lose or land BOTH
                with cat.commit_batch():
                    cat.set_record_count("t", vid, 1)
                    cat.set_active_version("t", vid, expected_parent=base)
                log.write("flipped " + vid + " from " + str(base) + " batched\\n")
            elif r < 0.5:
                # deletion-vector-shaped finalize (DV delete / MoR
                # upsert): manifest + mask + count + flip are ONE
                # transaction — a kill must never land a mask without
                # its manifest/flip or vice versa
                with cat.commit_batch():
                    cat.set_deletion_vectors("t", vid, {"t/" + vid + "/part-0.parquet": [0]})
                    cat.set_record_count("t", vid, 0)
                    cat.set_active_version("t", vid, expected_parent=base)
                log.write("flipped " + vid + " from " + str(base) + " dv\\n")
            else:
                cat.set_active_version("t", vid, expected_parent=base)
                log.write("flipped " + vid + " from " + str(base) + "\\n")
        except ConcurrentWriteError:
            log.write("refused " + vid + "\\n")
            cat.drop_version("t", vid)
        time.sleep(rng.uniform(0, 0.01))
    except Exception as e:  # transient cross-process races must not wedge the worker
        log.write("error " + type(e).__name__ + "\\n")
        time.sleep(0.01)
""" % {"repo": REPO}

N_WORKERS = 4
KILL_ROUNDS = 5


def _spawn(wh, wid, log_path):
    return subprocess.Popen(
        [sys.executable, "-c", WORKER, wh, str(wid), log_path],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )


def test_vacuum_orphans_sweeps_crash_leftovers(tmp_path):
    """The companion of the metadata-first delete ordering: files a
    crash stranded (unregistered version dirs; unreferenced files
    inside manifest versions) are swept by vacuum_orphans — while
    live manifest files, files younger than the grace period, and
    legacy (manifest-less) versions are untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from patterns_devkit_spark.catalog.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    cat.ensure_table("t")
    vid = cat.create_new_version("t")
    vdir = cat.version_dir("t", vid)
    pq.write_table(pa.table({"a": [1]}), os.path.join(vdir, "live.parquet"))
    cat.set_manifest("t", vid, [f"t/{vid}/live.parquet"])
    cat.set_active_version("t", vid)
    old = (1, 1)
    # (a) unreferenced file inside the live manifest version
    stray = os.path.join(vdir, "stray.parquet")
    pq.write_table(pa.table({"a": [2]}), stray)
    os.utime(stray, old)
    # (b) whole version dir no longer registered (crash mid-drop)
    ghost_dir = os.path.join(os.path.dirname(vdir), "v9999999")
    os.makedirs(ghost_dir)
    ghost = os.path.join(ghost_dir, "ghost.parquet")
    pq.write_table(pa.table({"a": [3]}), ghost)
    os.utime(ghost, old)
    # (c) fresh unreferenced file — inside grace, must survive
    fresh = os.path.join(vdir, "fresh.parquet")
    pq.write_table(pa.table({"a": [4]}), fresh)
    # (d) legacy version without a manifest — never touched
    lv = cat.create_new_version("t")
    legacy = os.path.join(cat.version_dir("t", lv), "legacy.parquet")
    pq.write_table(pa.table({"a": [5]}), legacy)
    os.utime(legacy, old)
    cat._mutate(lambda doc: doc["tables"]["t"]["manifests"].pop(lv, None))

    swept = cat.vacuum_orphans(grace_seconds=3600)
    assert sorted(swept) == [f"t/{vid}/stray.parquet", "t/v9999999/ghost.parquet"]
    assert os.path.exists(os.path.join(vdir, "live.parquet"))
    assert os.path.exists(fresh)
    assert os.path.exists(legacy)
    assert not os.path.exists(ghost_dir)


@pytest.mark.parametrize("backend", ["json", "sqlite", "objectstore"])
def test_crash_fuzz_multi_writer(tmp_path, backend):
    """json/sqlite serialize writers pessimistically (flock / BEGIN
    IMMEDIATE); objectstore is the LOCK-LESS conditional-put shim
    (VERDICT r5 item 6) where ANY commit may refuse with
    ConcurrentWriteError and the invariants must hold through
    optimistic retries instead of mutual exclusion."""
    from patterns_devkit_spark.catalog.catalog import DEFAULT_RETENTION, Catalog

    wh = str(tmp_path / f"wh_{backend}")
    Catalog(wh, backend=backend).ensure_table("t")  # fix the store format
    logs = [str(tmp_path / f"w{i}.log") for i in range(N_WORKERS)]
    procs = [_spawn(wh, i, logs[i]) for i in range(N_WORKERS)]
    rng = random.Random(42)

    def _n_created() -> int:
        n = 0
        for lp in logs:
            if os.path.exists(lp):
                with open(lp) as fh:
                    n += sum(1 for line in fh if line.startswith("created"))
        return n

    try:
        # under heavy host load the workers' python+pyarrow startup can
        # exceed the whole kill window, leaving created == 0 and the
        # "too little work" guard tripping spuriously — wait until the
        # fleet has actually produced work before the first kill
        deadline = time.time() + 120
        while _n_created() < 5 and time.time() < deadline:
            time.sleep(0.2)
        for _ in range(KILL_ROUNDS):
            time.sleep(0.4)
            i = rng.randrange(N_WORKERS)
            procs[i].send_signal(signal.SIGKILL)  # mid-anything, no cleanup
            procs[i].wait()
            procs[i] = _spawn(wh, i, logs[i])
        time.sleep(0.6)
    finally:
        for p in procs:
            p.send_signal(signal.SIGKILL)
            p.wait()

    # 1. the store reloads cleanly after every kill
    cat = Catalog(wh)
    meta = cat.table_meta("t")
    assert meta is not None
    versions, active = meta["versions"], meta["active_version"]
    assert len(versions) == len(set(versions))
    assert active is None or active in versions

    created, flips = set(), []
    for lp in logs:
        if not os.path.exists(lp):
            continue
        for line in open(lp):
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "created":
                created.add(parts[1])
            elif parts[0] == "flipped":
                flips.append((parts[1], parts[3], parts[4] if len(parts) > 4 else ""))
    assert len(created) >= 5, "fuzz produced too little work to mean anything"

    # 2. CAS linearizability: one successful flip per base version
    parents = [p for _, p, _b in flips]
    assert len(parents) == len(set(parents)), "two writers won a CAS from the same base"

    # 2b. batch atomicity: every RETAINED batched flip carries its
    # batched record_count (count + flip were one transaction; GC may
    # have dropped old versions entirely, which is fine)
    retained = set(versions)
    for vid, _p, kind in flips:
        if kind == "batched" and vid in retained:
            assert cat.get_record_count("t", vid) == 1, f"batched flip {vid} lost its count"
        if kind == "dv" and vid in retained:
            # DV-shaped finalize: mask + count landed with the flip
            assert cat.get_record_count("t", vid) == 0, f"dv flip {vid} lost its count"
            assert cat.get_deletion_vectors("t", vid), f"dv flip {vid} lost its mask"
    # 2c. mask/manifest consistency: ANY retained version's DV refs
    # resolve within its own manifest (a kill can never orphan a mask)
    for vid in versions:
        refs_v = set(cat.get_manifest("t", vid) or [])
        for ref in cat.get_deletion_vectors("t", vid):
            assert ref in refs_v, f"version {vid} masks unknown file {ref}"

    # 3. the active version is real work and its manifest resolves
    if active is not None:
        assert active in created
        refs = cat.get_manifest("t", active) or []
        assert refs, "active version lost its manifest"
        for ref in refs:
            assert os.path.exists(os.path.join(wh, "tables", ref))

    # 4. crash orphans are swept by normal retention GC
    cat.gc_versions("t")
    meta = cat.table_meta("t")
    inactive = [v for v in meta["versions"] if v != meta["active_version"]]
    assert len(inactive) <= DEFAULT_RETENTION
    # retained versions' files survive GC; everything else is gone
    for v in meta["versions"]:
        for ref in cat.get_manifest("t", v) or []:
            assert os.path.exists(os.path.join(wh, "tables", ref))
