"""Write-path CHECK constraint enforcement (engine extension; the
write-side counterpart of the q120 constraint audit). Delta CHECK
semantics: a row violates only when the expression evaluates FALSE —
NULL passes. A violating flush writes nothing; the active version is
untouched."""
import pytest

from patterns_devkit_spark import CheckConstraintViolation, Table


def test_violating_append_rejected_table_unchanged(engine):
    with engine.node_context("w", outputs={"out": "cc1"}):
        t = Table("out", "w")
        t.init(check_constraints={"qty_positive": "qty > 0"})
        t.append([{"id": 1, "qty": 5}])
        t.flush()
        t.append([{"id": 2, "qty": -3}, {"id": 3, "qty": 4}])
        with pytest.raises(CheckConstraintViolation, match="qty_positive.*1 row"):
            t.flush()
    with engine.node_context("r", inputs={"in": "cc1"}):
        rows = Table("in", "r").read()
        assert sorted(r["id"] for r in rows) == [1]  # rejected batch wrote NOTHING


def test_null_evaluation_passes_unless_not_null_declared(engine):
    with engine.node_context("w", outputs={"out": "cc2"}):
        t = Table("out", "w")
        t.init(check_constraints={"qty_positive": "qty > 0"})
        t.append([{"id": 1, "qty": None}])  # NULL > 0 is NULL -> passes
        t.flush()
        assert t.record_count == 1
    with engine.node_context("w2", outputs={"out": "cc3"}):
        t = Table("out", "w")
        t.init(
            check_constraints={
                "qty_positive": "qty > 0",
                "qty_present": "qty IS NOT NULL",
            }
        )
        t.append([{"id": 1, "qty": None}])
        with pytest.raises(CheckConstraintViolation, match="qty_present"):
            t.flush()


def test_upsert_and_multiple_violations_reported(engine):
    with engine.node_context("w", outputs={"out": "cc4"}):
        t = Table("out", "w")
        t.init(
            unique_on="id",
            check_constraints={"qty_pos": "qty > 0", "id_range": "id < 100"},
        )
        t.upsert([{"id": 1, "qty": 2}])
        t.flush()
        t.upsert([{"id": 200, "qty": -1}])
        with pytest.raises(CheckConstraintViolation) as ei:
            t.flush()
        assert "qty_pos" in str(ei.value) and "id_range" in str(ei.value)
    with engine.node_context("r", inputs={"in": "cc4"}):
        assert [r["id"] for r in Table("in", "r").read()] == [1]


def test_constraint_added_later_applies_to_new_writes_only(engine):
    with engine.node_context("w", outputs={"out": "cc5"}):
        t = Table("out", "w")
        t.append([{"id": 1, "qty": -9}])  # no constraints yet: lands
        t.flush()
        t.init(check_constraints={"qty_pos": "qty > 0"})
        t.append([{"id": 2, "qty": 3}])
        t.flush()  # clean batch passes; old bad row is NOT re-checked
        assert t.record_count == 2
        t.append([{"id": 3, "qty": -1}])
        with pytest.raises(CheckConstraintViolation):
            t.flush()
