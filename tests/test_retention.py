import time
from patterns_devkit_spark import Table


def test_time_based_retention(engine):
    with engine.node_context("n", outputs={"out": "ret"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], retention_keep=1, retention_seconds=3600)
        t.append([{"id": 1, "v": 0}]); t.flush()
        for i in range(4):
            t.upsert([{"id": 1, "v": i + 1}]); t.flush()
        # count says keep 1 inactive, age says keep ALL (they're new)
        assert len(engine.catalog.table_meta("ret")["versions"]) == 5
        # shrink the window: count-based pruning resumes
        engine.catalog.update_table_meta("ret", retention_seconds=0.0)
        engine.catalog.gc_versions("ret")
        assert len(engine.catalog.table_meta("ret")["versions"]) == 2


def test_time_based_retention_expires(engine):
    import time as _t

    with engine.node_context("n", outputs={"out": "ret2"}):
        t = Table("out", "w")
        t.init(unique_on=["id"], retention_keep=1, retention_seconds=0.05)
        t.append([{"id": 1, "v": 0}]); t.flush()
        for i in range(3):
            t.upsert([{"id": 1, "v": i + 1}]); t.flush()
        _t.sleep(0.1)  # every inactive version ages past the window
        engine.catalog.gc_versions("ret2")
        assert len(engine.catalog.table_meta("ret2")["versions"]) == 2
        # the aged-out versions' created_at stamps went with them
        meta = engine.catalog.table_meta("ret2")
        assert set(meta.get("created_at", {})) <= set(meta["versions"])
