"""Catalog persistence-backend contract: the same metastore semantics
must hold whichever store (json file / sqlite WAL db / lock-less object-store shim) sits underneath
— SCALE.md §6's "the interface is the contract, not the file format",
made executable. The full suite additionally runs once with
PDS_CATALOG_BACKEND=sqlite to prove the engine end-to-end is
backend-agnostic (recorded in SCALE.md)."""
import datetime as dt
import os

import pytest

from patterns_devkit_spark.catalog.backends import (
    JsonFileBackend,
    SqliteBackend,
    resolve_backend,
)
from patterns_devkit_spark.catalog.catalog import Catalog

BACKENDS = ["json", "sqlite", "objectstore"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    return request.param


def test_version_lifecycle(tmp_path, backend):
    cat = Catalog(str(tmp_path), backend=backend)
    v1 = cat.create_new_version("t")
    cat.set_active_version("t", v1)
    v2 = cat.create_new_version("t")
    assert cat.get_active_version("t") == v1
    cat.set_active_version("t", v2)
    assert cat.get_active_version("t") == v2
    with pytest.raises(KeyError):
        cat.set_active_version("t", "v9999999")
    # reopen: state survives the process boundary
    cat2 = Catalog(str(tmp_path), backend=backend)
    assert cat2.get_active_version("t") == v2
    assert cat2.table_meta("t")["versions"] == [v1, v2]


def test_cursor_state_atomic_commit_roundtrip(tmp_path, backend):
    cat = Catalog(str(tmp_path), backend=backend)
    ts = dt.datetime(2024, 5, 1, 12, 30, 45, 123456)
    cat.commit_cursor_and_state(
        "node_a", {("events", "ts"): ts, ("orders", "o_orderkey"): 42}, {"n": 7}
    )
    cat2 = Catalog(str(tmp_path), backend=backend)
    # typed values round-trip exactly (datetime tag survives the store)
    assert cat2.get_cursor("node_a", "events", "ts") == ts
    assert cat2.get_cursor("node_a", "orders", "o_orderkey") == 42
    assert cat2.get_state("node_a") == {"n": 7}
    rows = {(n, t, o): v for n, t, o, v in cat2.cursors()}
    assert rows[("node_a", "events", "ts")] == ts


def test_event_log_offset_resume(tmp_path, backend):
    cat = Catalog(str(tmp_path), backend=backend)
    cat.append_event("t1", "append", node_id="n1")
    evts, off = cat.read_events(0)
    assert [e["table"] for e in evts] == ["t1"]
    # nothing new: offset is stable and returns empty
    evts2, off2 = cat.read_events(off)
    assert evts2 == [] and off2 == off
    cat.append_event("t2", "replace", node_id="n2")
    evts3, off3 = cat.read_events(off)
    assert [e["table"] for e in evts3] == ["t2"] and off3 != off
    # a fresh Catalog instance resumes from the same opaque token
    evts4, _ = Catalog(str(tmp_path), backend=backend).read_events(off)
    assert [e["table"] for e in evts4] == ["t2"]


def test_secrets_and_monotonic_blocks(tmp_path, backend):
    cat = Catalog(str(tmp_path), backend=backend)
    cat.set_secret("api", {"key": "abc", "blob": b"\x00\xff"})
    assert cat.allocate_monotonic_block("t", 10) == 1
    assert cat.allocate_monotonic_block("t", 5) == 11
    cat2 = Catalog(str(tmp_path), backend=backend)
    assert cat2.get_secret("api") == {"key": "abc", "blob": b"\x00\xff"}
    assert cat2.allocate_monotonic_block("t", 1) == 16


def test_autodetect_keeps_warehouse_format(tmp_path, monkeypatch):
    """A warehouse keeps the backend it was created with — no env var
    needed on reopen."""
    monkeypatch.delenv("PDS_CATALOG_BACKEND", raising=False)
    w1, w2 = tmp_path / "wj", tmp_path / "ws"
    Catalog(str(w1), backend="json").ensure_table("a")
    Catalog(str(w2), backend="sqlite").ensure_table("b")
    assert isinstance(resolve_backend(str(w1)), JsonFileBackend)
    assert isinstance(resolve_backend(str(w2)), SqliteBackend)
    assert Catalog(str(w1)).table_names() == ["a"]
    assert Catalog(str(w2)).table_names() == ["b"]
    assert os.path.exists(w1 / "catalog.json") and not os.path.exists(w1 / "catalog.db")
    assert os.path.exists(w2 / "catalog.db") and not os.path.exists(w2 / "catalog.json")


def test_env_var_selects_backend(tmp_path, monkeypatch):
    monkeypatch.setenv("PDS_CATALOG_BACKEND", "sqlite")
    cat = Catalog(str(tmp_path / "w"))
    assert isinstance(cat._backend, SqliteBackend)
    monkeypatch.setenv("PDS_CATALOG_BACKEND", "bogus")
    with pytest.raises(ValueError, match="unknown catalog backend"):
        Catalog(str(tmp_path / "w2"))


def test_env_var_never_shadows_existing_store(tmp_path, backend, monkeypatch):
    """Split-brain regression (round-4 verdict, What's wrong #1): a
    process that inherits PDS_CATALOG_BACKEND pointing at the OTHER
    format and opens an EXISTING warehouse must still see the real
    catalog — not an empty parallel one. The env var only picks the
    format of new warehouses."""
    monkeypatch.delenv("PDS_CATALOG_BACKEND", raising=False)
    w = str(tmp_path / "w")
    cat = Catalog(w, backend=backend)
    cat.ensure_table("t")
    v = cat.create_new_version("t")
    cat.set_active_version("t", v)

    other = "sqlite" if backend == "json" else "json"
    monkeypatch.setenv("PDS_CATALOG_BACKEND", other)
    reopened = Catalog(w)
    assert reopened._backend.name == backend  # existing store wins
    assert reopened.table_names() == ["t"]
    assert reopened.get_active_version("t") == v
    # and no second parallel store appeared on disk
    assert not (
        os.path.exists(os.path.join(w, "catalog.json"))
        and os.path.exists(os.path.join(w, "catalog.db"))
    )


def test_explicit_backend_mismatch_raises(tmp_path, backend, monkeypatch):
    """An explicit backend= that contradicts the existing store is a
    hard error pointing at `patterns catalog migrate` — never a silent
    empty catalog."""
    monkeypatch.delenv("PDS_CATALOG_BACKEND", raising=False)
    w = str(tmp_path / "w")
    Catalog(w, backend=backend).ensure_table("t")
    other = "sqlite" if backend == "json" else "json"
    with pytest.raises(ValueError, match="catalog migrate"):
        Catalog(w, backend=other)
    # matching explicit choice still fine
    assert Catalog(w, backend=backend).table_names() == ["t"]


def test_migrate_backend_roundtrip(tmp_path, backend, monkeypatch):
    """json -> sqlite -> json (or the reverse) preserves the whole
    document and the ordered event log; auto-detect then opens the
    migrated format. Offsets are not portable (documented): re-tail
    from 0 after a migration."""
    monkeypatch.delenv("PDS_CATALOG_BACKEND", raising=False)
    other = "sqlite" if backend == "json" else "json"
    w = str(tmp_path)
    cat = Catalog(w, backend=backend)
    v = cat.create_new_version("t")
    cat.set_active_version("t", v)
    ts = dt.datetime(2024, 1, 2, 3, 4, 5)
    cat.commit_cursor_and_state("n", {("t", "id"): ts}, {"k": 1})
    cat.append_event("t", "append", node_id="n")
    cat.append_event("t", "replace", node_id="n")
    assert cat.migrate_backend(other) == other
    # same live instance keeps working on the new backend
    cat.set_state("n2", {"post": True})
    # reopen via auto-detect: everything survived, old store removed
    fresh = Catalog(w)
    assert fresh._backend.name == other
    assert fresh.get_active_version("t") == v
    assert fresh.get_cursor("n", "t", "id") == ts
    assert fresh.get_state("n2") == {"post": True}
    evts, _ = fresh.read_events(0)
    assert [e["kind"] for e in evts] == ["append", "replace"]
    # migrating to the current backend is a no-op
    assert fresh.migrate_backend(other) == other


def test_sqlite_event_appends_from_two_processes(tmp_path):
    """The append-only event log IS safe under real multi-process
    contention on the sqlite backend (WAL + per-insert transactions
    serialize writers at the database): two OS processes interleave
    100 appends each; all 200 survive, each process's events in its
    own order. This is the property a multi-runner deployment leans
    on; the document store remains single-live-writer by contract."""
    import subprocess
    import sys as _sys

    w = str(tmp_path)
    Catalog(w, backend="sqlite")  # create the store
    prog = (
        "import sys; sys.path.insert(0, {root!r});"
        "from patterns_devkit_spark.catalog.catalog import Catalog;"
        "cat = Catalog({w!r}, backend='sqlite');"
        "[cat.append_event('t', 'append', node_id=sys.argv[1], seq=i) for i in range(100)]"
    ).format(root=os.path.dirname(os.path.dirname(os.path.abspath(__file__))), w=w)
    procs = [
        subprocess.Popen([_sys.executable, "-c", prog, name])
        for name in ("p1", "p2")
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    evts, _ = Catalog(w, backend="sqlite").read_events(0)
    assert len(evts) == 200
    for name in ("p1", "p2"):
        seqs = [e["seq"] for e in evts if e["node_id"] == name]
        assert seqs == list(range(100))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ops = st.lists(
    st.one_of(
        st.tuples(st.just("new_version"), st.sampled_from(["ta", "tb"])),
        st.tuples(st.just("activate_latest"), st.sampled_from(["ta", "tb"])),
        st.tuples(st.just("state"), st.integers(0, 99)),
        st.tuples(st.just("cursor"), st.integers(0, 99)),
        st.tuples(st.just("monotonic"), st.integers(1, 10)),
        st.tuples(st.just("event"), st.sampled_from(["append", "replace"])),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=40, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=_ops)
def test_backends_agree_on_any_op_sequence(tmp_path_factory, ops):
    """Property: ANY sequence of catalog mutations leaves the two
    backends with identical observable state (document content AND the
    ordered event log) — the interface really is the contract."""
    cats = [
        Catalog(str(tmp_path_factory.mktemp(f"w_{b}")), backend=b)
        for b in BACKENDS
    ]
    for op, arg in ops:
        for cat in cats:
            if op == "new_version":
                cat.create_new_version(arg)
            elif op == "activate_latest":
                vs = cat.ensure_table(arg)["versions"]
                if vs:
                    cat.set_active_version(arg, vs[-1])
            elif op == "state":
                cat.set_state(f"n{arg % 3}", {"v": arg})
            elif op == "cursor":
                cat.set_cursor(f"n{arg % 3}", "t", "id", arg)
            elif op == "monotonic":
                cat.allocate_monotonic_block("ta", arg)
            elif op == "event":
                cat.append_event("ta", arg, node_id="n0")
    # compare as a FRESH load (what the next process would see);
    # publish-log entries carry wall-clock commit times (the AS-OF
    # time-travel history) — normalize those to the vid sequence the
    # same way event-log "ts" is stripped below
    docs = [Catalog(c.root, backend=b)._doc for c, b in zip(cats, BACKENDS)]
    for doc in docs:
        for meta in doc.get("tables", {}).values():
            if "publish_log" in meta:
                meta["publish_log"] = [vid for _ts, vid in meta["publish_log"]]
            if "created_at" in meta:
                # per-version creation stamps (time-based retention)
                # are wall-clock by design: normalize to the vid set
                meta["created_at"] = sorted(meta["created_at"])
    for d in docs[1:]:
        assert d == docs[0]
    logs = [
        [
            {k: v for k, v in e.items() if k != "ts"}
            for e in Catalog(c.root, backend=b).read_events(0)[0]
        ]
        for c, b in zip(cats, BACKENDS)
    ]
    for lg in logs[1:]:
        assert lg == logs[0]


def test_writer_handoff(tmp_path, backend):
    """Sequential ownership handoff: a second Catalog instance opened
    after the first's commits sees exactly that committed state and
    can continue mutating it. (Both backends assume one live writer at
    a time per warehouse — the reference's engine holds the same
    single-owner session against its metastore.)"""
    w = str(tmp_path)
    a = Catalog(w, backend=backend)
    v1 = a.create_new_version("t")
    a.set_active_version("t", v1)
    a.set_state("na", {"from": "a"})
    b = Catalog(w, backend=backend)
    assert b.get_active_version("t") == v1
    b.set_state("nb", {"from": "b"})
    fresh = Catalog(w, backend=backend)
    assert fresh.get_state("na") == {"from": "a"}
    assert fresh.get_state("nb") == {"from": "b"}
    assert fresh.get_active_version("t") == v1


# -- object-store shim specifics (r6: VERDICT r5 item 6) ----------------


def test_objectstore_optimistic_conflict_and_burned_commit(tmp_path):
    """The lock-less conditional-put backend: a commit landing inside
    an open transaction refuses it (ConcurrentWriteError, nothing
    persisted); a crashed writer's empty commit object (created,
    never written) is a BURNED number — readers skip it, the next
    writer commits past it, and it is never reclaimed."""
    from patterns_devkit_spark.catalog.backends import ObjectStoreBackend
    from patterns_devkit_spark.catalog.catalog import ConcurrentWriteError

    w = str(tmp_path / "w")
    b = ObjectStoreBackend(w)
    b.save({"tables": {"n": 1}})
    with pytest.raises(ConcurrentWriteError, match="conditional put refused"):
        with b.transaction() as doc:
            doc["tables"]["mine"] = True
            with ObjectStoreBackend(w).transaction() as doc2:  # racer wins
                doc2["tables"]["racer"] = True
    doc = b.load()
    assert "racer" in doc["tables"] and "mine" not in doc["tables"]

    # crashed writer: head+1 exists but is empty (create, no write)
    head = max(b._numbers())
    open(os.path.join(b._commits, f"{head + 1:020d}.json"), "x").close()
    assert b.load()["tables"]["racer"] is True  # readers skip the burn
    with b.transaction() as doc:
        doc["tables"]["after_burn"] = True
    assert b.load()["tables"]["after_burn"] is True
    assert max(b._numbers()) == head + 2  # burned number never reclaimed


def test_objectstore_no_rename_no_lock_primitives(tmp_path):
    """The shim must stay honest: no os.replace/rename, no fcntl in its
    code path — the store's only primitives are put-if-absent, get,
    list, delete (the object-store contract the docstring pins)."""
    import inspect

    from patterns_devkit_spark.catalog import backends

    src = inspect.getsource(backends.ObjectStoreBackend)
    for banned in ("os.replace(", "os.rename(", "import fcntl", "flock("):
        assert banned not in src, f"ObjectStoreBackend uses {banned}"


def test_objectstore_event_log_survives_crashed_append(tmp_path):
    """Review r6: a writer killed between event-object create and write
    leaves a permanently empty object; past the grace window readers
    must skip it (burned) instead of wedging the log forever."""
    import os as _os
    import time as _time

    from patterns_devkit_spark.catalog.backends import ObjectStoreBackend

    b = ObjectStoreBackend(str(tmp_path / "w"))
    b.append_event({"e": 1})
    # crashed append: created, never written — and aged past the grace
    _os.makedirs(b._events, exist_ok=True)
    ghost = _os.path.join(b._events, f"{_time.time_ns():025d}-0-dead.json")
    open(ghost, "x").close()
    _os.utime(ghost, (1, 1))
    b.append_event({"e": 2})
    evs, off = b.read_events()
    assert [e["e"] for e in evs] == [1, 2]
    assert b.read_events(off)[0] == []
