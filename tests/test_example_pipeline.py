"""The examples/curation_pipeline app runs end-to-end through the
graph runner: ingest -> constraint audit -> quality/mix/dedup curate ->
SQL stats, all via the public node surface (`import patterns`)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from patterns_devkit_spark import Table  # noqa: E402
from patterns_devkit_spark.graph.runner import GraphRunner  # noqa: E402

APP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "examples", "curation_pipeline")


def test_curation_pipeline_example(engine):
    runner = GraphRunner(engine, APP)
    executed = runner.run_all()
    assert executed[0] == "ingest01"
    assert {"audit001", "curate01", "stats001"} <= set(executed)

    with engine.node_context("check", inputs={"d": "docs", "a": "audit", "k": "kept", "s": "stats"}):
        n_docs = Table("d", "r").record_count
        audit = {r["check_name"]: r["passed"] for r in Table("a", "r").read()}
        kept = Table("k", "r").read_dataframe()
        stats = Table("s", "r").read_dataframe()

    assert n_docs == 500  # sf0.001 documents
    assert audit == {"doc_id_unique": 1, "text_not_null": 1, "n_chars_positive": 1}
    # curation keeps a strict, non-empty subset
    assert 0 < len(kept) < n_docs
    # mix acceptance really filtered (~80 %) and quality floor applied
    assert set(kept.columns) >= {"doc_id", "text", "source", "quality_score"}
    # SQL stats node aggregates exactly the kept table
    assert stats["n_docs"].sum() == len(kept)
    assert stats["total_chars"].sum() == kept["n_chars"].sum()
