"""Write-audit-publish (staged versions) + atomic multi-table commit.
Staging is invisible to readers; publish validates against the STORED
staged data before flipping; abandon drops the staging; the
multi-table flip is one catalog persist (all-or-nothing)."""
import pytest

from patterns_devkit_spark import CheckConstraintViolation, Table


def test_staged_invisible_then_published(engine):
    with engine.node_context("w", outputs={"out": "wap1"}):
        t = Table("out", "w")
        t.append([{"id": 1}])
        t.flush()
        v_active = t.get_active_version().version_id
        staged = t.write_staged([{"id": 2}, {"id": 3}])
        # readers still see the old version; staging is addressable
        assert t.get_active_version().version_id == v_active
        assert sorted(r["id"] for r in t.read()) == [1]
        assert t.read_spark(version=staged.version_id).count() == 2
        t.publish(staged.version_id)
        assert t.get_active_version().version_id == staged.version_id
        assert sorted(r["id"] for r in t.read()) == [2, 3]


def test_publish_audit_rejects_and_abandon(engine):
    with engine.node_context("w", outputs={"out": "wap2"}):
        t = Table("out", "w")
        t.init(check_constraints={"qty_pos": "qty > 0"})
        t.append([{"id": 1, "qty": 5}])
        t.flush()
        v_active = t.get_active_version().version_id
        staged = t.write_staged([{"id": 2, "qty": -1}])
        with pytest.raises(CheckConstraintViolation, match="qty_pos"):
            t.publish(staged.version_id)
        assert t.get_active_version().version_id == v_active  # untouched
        # ad-hoc audit on top of declared constraints
        staged2 = t.write_staged([{"id": 3, "qty": 2}])
        with pytest.raises(CheckConstraintViolation, match="id_cap"):
            t.publish(staged2.version_id, checks={"id_cap": "id < 3"})
        t.abandon(staged.version_id)
        t.abandon(staged2.version_id)
        vids = [v["version_id"] for v in t.list_versions()]
        assert staged.version_id not in vids and staged2.version_id not in vids
        with pytest.raises(ValueError, match="active"):
            t.abandon(v_active)


def test_atomic_multi_table_publish(engine):
    """Fact + dim staged independently, flipped together; a failing
    audit on ONE table publishes NEITHER."""
    with engine.node_context("w1", outputs={"out": "fact"}):
        tf = Table("out", "w")
        tf.append([{"k": 1, "amt": 10}])
        tf.flush()
        sf = tf.write_staged([{"k": 2, "amt": 20}])
    with engine.node_context("w2", outputs={"out": "dim"}):
        td = Table("out", "w")
        td.init(check_constraints={"k_pos": "k > 0"})
        td.append([{"k": 1, "name": "a"}])
        td.flush()
        sd = td.write_staged([{"k": 2, "name": "b"}])
        v_dim_active = td.get_active_version().version_id

    engine.publish_atomic({"fact": sf.version_id, "dim": sd.version_id})
    assert engine.catalog.get_active_version("fact") == sf.version_id
    assert engine.catalog.get_active_version("dim") == sd.version_id

    # second round: dim staging violates its constraint -> neither flips
    with engine.node_context("w1", outputs={"out": "fact"}):
        tf = Table("out", "w")
        sf2 = tf.write_staged([{"k": 3, "amt": 30}])
    with engine.node_context("w2", outputs={"out": "dim"}):
        td = Table("out", "w")
        sd2 = td.write_staged([{"k": -9, "name": "bad"}])
    with pytest.raises(CheckConstraintViolation, match="k_pos"):
        engine.publish_atomic({"fact": sf2.version_id, "dim": sd2.version_id})
    assert engine.catalog.get_active_version("fact") == sf.version_id
    assert engine.catalog.get_active_version("dim") == sd.version_id


def test_publish_emits_event_and_triggers_downstream(engine):
    with engine.node_context("w", outputs={"out": "wap3"}):
        t = Table("out", "w")
        staged = t.write_staged([{"x": 1}])
        t.publish(staged.version_id)
    events, _ = engine.catalog.read_events()
    kinds = [e["kind"] for e in events if e["table"] == "wap3"]
    assert "create" in kinds  # first publish = table creation event
