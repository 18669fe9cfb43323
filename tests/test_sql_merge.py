"""SQL MERGE INTO routed through execute_sql (VERDICT r5 'what's
missing'; reference contract: arbitrary DML via execute_sql,
node.py:356-373): the standard upsert statement compiles to
Table.upsert (plain SET */INSERT * form) or to one apply_cdc batch
(U/D/I), so merge-on-read targets take the deletion-vector path and
the usual update events are emitted."""
import pytest

from patterns_devkit_spark import Table


def _mk(engine, name, mor=False):
    t = Table("out", "w")
    t.init(unique_on=["id"], **({"merge_on_read": True} if mor else {}))
    t.append(
        engine.spark.createDataFrame(
            [(i, i * 10, "base") for i in range(10)], "id long, v long, tag string"
        ).coalesce(2)
    )
    t.flush()
    return t


def _rows(t):
    return sorted((r["id"], r["v"], r["tag"]) for r in t.read_spark().collect())


def test_merge_full_upsert_form(engine):
    """SET * / INSERT * is exactly Table.upsert: updates existing keys,
    inserts new ones, leaves the rest."""
    with engine.node_context("n", outputs={"out": "mg1", "src": "mg1_src"}):
        t = _mk(engine, "mg1")
        s = Table("src", "w")
        s.append([{"id": 1, "v": -1, "tag": "new"}, {"id": 99, "v": 990, "tag": "new"}])
        s.flush()
        t.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ mg1_src }} AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        rows = _rows(t)
    expected = sorted([(i, i * 10, "base") for i in range(2, 10)] + [(0, 0, "base"), (1, -1, "new"), (99, 990, "new")])
    assert rows == expected


def test_merge_update_delete_insert_clauses(engine):
    """Explicit SET list, conditional DELETE, and column-list INSERT in
    one statement; expressions reference both aliases."""
    with engine.node_context("n", outputs={"out": "mg2", "src": "mg2_src"}):
        t = _mk(engine, "mg2")
        s = Table("src", "w")
        s.append(
            [
                {"id": 1, "delta": 5},    # matched, delta < 100 -> UPDATE
                {"id": 2, "delta": 500},  # matched, delta >= 100 -> DELETE
                {"id": 50, "delta": 7},   # not matched -> INSERT
            ]
        )
        s.flush()
        t.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ mg2_src }} AS s ON t.id = s.id "
            "WHEN MATCHED AND s.delta < 100 THEN UPDATE SET t.v = t.v + s.delta, tag = 'upd' "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED AND s.delta < 100 THEN INSERT (id, v, tag) VALUES (s.id, s.delta * 2, 'ins')"
        )
        rows = _rows(t)
    expected = sorted(
        [(i, i * 10, "base") for i in range(10) if i not in (1, 2)]
        + [(1, 15, "upd"), (50, 14, "ins")]
    )
    assert rows == expected


def test_merge_clause_order_first_match_wins(engine):
    """ANSI: a row matching both matched clauses takes the FIRST one;
    with DELETE listed first, the UPDATE applies only to its complement."""
    with engine.node_context("n", outputs={"out": "mg3", "src": "mg3_src"}):
        t = _mk(engine, "mg3")
        s = Table("src", "w")
        s.append([{"id": 1, "delta": 500}, {"id": 2, "delta": 5}])
        s.flush()
        t.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ mg3_src }} AS s ON t.id = s.id "
            "WHEN MATCHED AND s.delta >= 100 THEN DELETE "
            "WHEN MATCHED THEN UPDATE SET t.v = 0, tag = 'u'"
        )
        rows = _rows(t)
    expected = sorted([(i, i * 10, "base") for i in range(10) if i not in (1, 2)] + [(2, 0, "u")])
    assert rows == expected


def test_merge_subquery_source_and_delete_only(engine):
    with engine.node_context("n", outputs={"out": "mg4", "src": "mg4_src"}):
        t = _mk(engine, "mg4")
        s = Table("src", "w")
        s.append([{"id": i} for i in range(0, 10, 2)])
        s.flush()
        t.execute_sql(
            "MERGE INTO {{ this }} AS t "
            "USING (SELECT id FROM {{ mg4_src }} WHERE id < 6) AS s "
            "ON t.id = s.id WHEN MATCHED THEN DELETE"
        )
        rows = _rows(t)
    assert [i for i, _, _ in rows] == [1, 3, 5, 6, 7, 8, 9]


def test_merge_mor_target_takes_dv_path(engine):
    """On a merge-on-read target, the routed MERGE masks old images
    and appends the batch — zero rewrite of untouched files."""
    with engine.node_context("n", outputs={"out": "mg5", "src": "mg5_src"}):
        t = _mk(engine, "mg5", mor=True)
        s = Table("src", "w")
        s.append([{"id": 1, "v": -1, "tag": "new"}, {"id": 99, "v": 990, "tag": "new"}])
        s.flush()
        t.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ mg5_src }} AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        v = t.get_active_version().version_id
        dvs = engine.catalog.get_deletion_vectors("mg5", v)
        assert sum(len(x) for x in dvs.values()) == 1  # old image of id=1 masked
        rows = _rows(t)
    expected = sorted([(i, i * 10, "base") for i in range(2, 10)] + [(0, 0, "base"), (1, -1, "new"), (99, 990, "new")])
    assert rows == expected


def test_merge_emits_update_event(engine):
    with engine.node_context("n", outputs={"out": "mg6", "src": "mg6_src"}):
        t = _mk(engine, "mg6")
        s = Table("src", "w")
        s.append([{"id": 1, "v": 0, "tag": "x"}])
        s.flush()
        _, offset = engine.catalog.read_events(0)
        t.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ mg6_src }} AS s ON t.id = s.id "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )
        events, _ = engine.catalog.read_events(offset)
    assert any(e["table"] == "mg6" and e["kind"] == "update" for e in events)


def test_merge_insert_only_and_missing_target(engine):
    with engine.node_context("n", outputs={"out": "mg7", "src": "mg7_src"}):
        t = Table("out", "w")
        t.init(unique_on=["id"])
        s = Table("src", "w")
        s.append([{"id": 1, "v": 10, "tag": "a"}, {"id": 2, "v": 20, "tag": "b"}])
        s.flush()
        # target has no data yet: only the NOT MATCHED branch applies
        t.execute_sql(
            "MERGE INTO {{ this }} AS t USING {{ mg7_src }} AS s ON t.id = s.id "
            "WHEN MATCHED THEN DELETE "
            "WHEN NOT MATCHED AND s.id = 2 THEN INSERT (id, v, tag) VALUES (s.id, s.v, s.tag)"
        )
        assert _rows(t) == [(2, 20, "b")]


def test_merge_validation_errors(engine):
    with engine.node_context("n", outputs={"out": "mg8", "src": "mg8_src"}):
        t = Table("out", "w")
        t.append([{"id": 1, "v": 1, "tag": "x"}])  # no unique_on
        t.flush()
        s = Table("src", "w")
        s.append([{"id": 1}])
        s.flush()
        with pytest.raises(ValueError, match="unique_on"):
            t.execute_sql(
                "MERGE INTO {{ this }} AS t USING {{ mg8_src }} AS s ON t.id = s.id "
                "WHEN MATCHED THEN DELETE"
            )
    with engine.node_context("n2", outputs={"out": "mg9", "src": "mg8_src"}):
        t = _mk(engine, "mg9")
        with pytest.raises(ValueError, match="alias"):
            t.execute_sql(
                "MERGE INTO {{ this }} USING (SELECT 1 AS id) ON id = id "
                "WHEN MATCHED THEN DELETE"
            )
        with pytest.raises(ValueError, match="unique_on"):
            t.execute_sql(
                "MERGE INTO {{ this }} AS t USING {{ mg8_src }} AS s ON t.v = s.id "
                "WHEN MATCHED THEN DELETE"
            )


def test_merge_rejects_unknown_set_and_insert_columns(engine):
    """Review r6: a typo'd or source-alias-qualified assignment target
    must raise naming the column — never be silently skipped."""
    with engine.node_context("n", outputs={"out": "mg9", "src": "mg9_src"}):
        t = _mk(engine, "mg9")
        s = Table("src", "w")
        s.append([{"id": 1, "v": -1, "tag": "x"}])
        s.flush()
        with pytest.raises(ValueError, match="non-target column.*s.v"):
            t.execute_sql(
                "MERGE INTO {{ this }} AS t USING {{ mg9_src }} AS s ON t.id = s.id "
                "WHEN MATCHED THEN UPDATE SET s.v = t.v + 1"
            )
        with pytest.raises(ValueError, match="non-target column.*vz"):
            t.execute_sql(
                "MERGE INTO {{ this }} AS t USING {{ mg9_src }} AS s ON t.id = s.id "
                "WHEN NOT MATCHED THEN INSERT (id, vz) VALUES (s.id, s.v)"
            )
