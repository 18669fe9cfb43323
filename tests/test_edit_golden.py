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
    assert n == 1  # only ingest.py lacked an id
    # removing the single inserted line reproduces the input EXACTLY
    lines = out.splitlines(keepends=True)
    inserted = [ln for ln in lines if ln.strip().startswith("id: ") and "fixed001" not in ln]
    assert len(inserted) == 1
    restored = "".join(ln for ln in lines if ln is not inserted[0])
    assert restored == GOLDEN
    # inserted directly under the entry start, matching indent
    idx = lines.index(inserted[0])
    assert lines[idx - 1].lstrip().startswith("- node_file: ingest.py")
    assert inserted[0].startswith("    id: ")


def test_assign_ids_idempotent():
    rng = random.Random(7)
    once, n1 = assign_missing_ids(GOLDEN, rng)
    twice, n2 = assign_missing_ids(once, rng)
    assert n1 == 1 and n2 == 0 and twice == once


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
