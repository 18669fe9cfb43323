"""Golden round-trip tests for graph.yml edits (the reference's test
hallmark: yaml in -> edit -> EXACT yaml out with comments preserved,
tests/configuration/test_config_editor.py:8-29,195-202)."""
import random
import textwrap

from patterns_devkit_spark.graph.edit import append_function_entry, assign_missing_ids

GOLDEN = textwrap.dedent(
    """\
    title: My app  # the app title
    # pipeline functions
    functions:
      - node_file: ingest.py
        outputs: {out: raw}   # lands raw data
      - node_file: transform.sql
        id: fixed001
        inputs: {src: raw}
        outputs: {result: clean}
    stores:
      - table: raw
      # downstream-facing table
      - table: clean
    """
)


def test_assign_ids_preserves_everything_else():
    rng = random.Random(7)
    out, n = assign_missing_ids(GOLDEN, rng)
    # reference add_missing_node_ids covers functions AND stores
    # (test_config_editor.py:151-178): ingest.py + both stores
    assert n == 3
    lines = out.splitlines(keepends=True)
    inserted = [ln for ln in lines if ln.strip().startswith("id: ") and "fixed001" not in ln]
    assert len(inserted) == 3
    # removing the inserted lines reproduces the input EXACTLY
    restored = "".join(ln for ln in lines if ln not in inserted)
    assert restored == GOLDEN
    # inserted directly under the entry start, matching indent
    idx = lines.index(inserted[0])
    assert lines[idx - 1].lstrip().startswith("- node_file: ingest.py")
    assert inserted[0].startswith("    id: ")


def test_assign_ids_idempotent():
    rng = random.Random(7)
    once, n1 = assign_missing_ids(GOLDEN, rng)
    twice, n2 = assign_missing_ids(once, rng)
    assert n1 == 3 and n2 == 0 and twice == once


def test_append_function_entry_preserves_comments():
    out = append_function_entry(GOLDEN, ["- webhook: hooks"])
    assert "# pipeline functions" in out
    assert "# the app title" in out
    assert "- webhook: hooks" in out
    # entry landed inside functions (before stores:)
    assert out.index("- webhook: hooks") < out.index("stores:")
    # original content otherwise intact
    assert out.replace("  - webhook: hooks\n", "") == GOLDEN


def test_append_into_empty_functions():
    text = "title: X\nfunctions: []\nstores: []\n"
    out = append_function_entry(text, ["- node_file: a.py"])
    assert "functions:\n  - node_file: a.py\n" in out
    assert "stores: []" in out


def test_editor_add_node_store_schema_round_trip():
    """GraphConfigEditor surface (reference edit.py:84-232): chained
    adds land in the right sections, the result is valid YAML the
    runner can compile, and every ORIGINAL byte (comments included)
    survives."""
    from patterns_devkit_spark.graph.edit import GraphConfigEditor

    out = (
        GraphConfigEditor(GOLDEN)
        .add_node(
            "score.py",
            id="score001",
            inputs={"in": "clean"},
            outputs={"out": "scored"},
            parameters={"threshold": 0.5},
            title="Scorer",
        )
        .add_webhook("intake", id="hook0001")
        .add_component_uses("acme/enrich@v2", id="comp0002", inputs={"a": "scored"}, outputs={"b": "enriched"})
        .add_store("scored", schema={"k": "Text", "v": "Float"})
        .add_store("enriched")
        .dump()
    )
    # original bytes intact (edits only insert)
    for line in GOLDEN.splitlines():
        assert line in out
    assert "# pipeline functions" in out and "# downstream-facing table" in out
    # valid YAML with everything in the right section
    import yaml

    doc = yaml.safe_load(out)
    funcs = {e.get("id"): e for e in doc["functions"]}
    assert funcs["score001"]["parameters"] == {"threshold": 0.5}
    assert funcs["score001"]["inputs"] == {"in": "clean"}
    assert funcs["hook0001"]["webhook"] == "intake"
    assert funcs["comp0002"]["uses"] == "acme/enrich@v2"
    stores = {e.get("table"): e for e in doc["stores"]}
    assert stores["scored"]["schema"] == {"k": "Text", "v": "Float"}
    assert "enriched" in stores


def test_editor_add_exposed_ports():
    from patterns_devkit_spark.graph.edit import GraphConfigEditor

    import yaml

    # no exposes section yet -> created
    out = GraphConfigEditor(GOLDEN).add_exposed_port("inputs", "raw").dump()
    assert yaml.safe_load(out)["exposes"] == {"inputs": ["raw"]}
    # block-list and flow-list forms both extended in place
    block = GOLDEN + "exposes:\n  outputs:\n    - clean\n"
    out2 = GraphConfigEditor(block).add_exposed_port("outputs", "scored").dump()
    assert yaml.safe_load(out2)["exposes"]["outputs"] == ["clean", "scored"]
    flow = GOLDEN + "exposes:\n  outputs: [clean]\n"
    out3 = GraphConfigEditor(flow).add_exposed_port("outputs", "scored").dump()
    assert yaml.safe_load(out3)["exposes"]["outputs"] == ["clean", "scored"]
    # section exists but target list missing
    out4 = GraphConfigEditor(block).add_exposed_port("inputs", "raw").dump()
    assert yaml.safe_load(out4)["exposes"] == {"inputs": ["raw"], "outputs": ["clean"]}
