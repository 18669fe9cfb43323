"""Byte-for-byte golden tests mirroring the reference editor suite
(reference tests/configuration/test_config_editor.py:8-202): same
before/after yaml strings, same `<id>` normalization — the editor must
script every mutation the reference CLI can, comments intact."""
import re
import textwrap

import pytest

from patterns_devkit_spark.graph.edit import GraphConfigEditor


def norm(s: str) -> str:
    return textwrap.dedent(s).strip()


def assert_dump(editor: GraphConfigEditor, expected: str) -> str:
    expected = norm(expected)
    dump = editor.dump().strip()
    if "<id>" in expected:
        dump = re.sub(r"id: \w+", "id: <id>", dump)
    assert dump == expected
    return editor.dump().strip()


def editor(s: str) -> GraphConfigEditor:
    return GraphConfigEditor(norm(s))


def test_round_trip():
    s = """
    title: graph
    functions:
      - webhook: out # eol comment
      # node 1
      - node_file: node_1.py
        inputs:
          in: out
    """
    assert_dump(editor(s), s)


def test_add_node_to_existing_nodes():
    before = """
    functions:
      - webhook: out # eol comment
    """
    after = """
    functions:
      - webhook: out # eol comment
      - node_file: node.py
        id: <id>
    """
    assert_dump(editor(before).add_node("node.py"), after)


def test_add_node_to_existing_nodes_no_indent():
    # reference test_round_trip_no_indent: left-margin lists keep
    # their indentation style on insert
    before = """
    functions:
    - webhook: out # eol comment
    """
    after = """
    functions:
    - webhook: out # eol comment
    - node_file: node.py
      id: <id>
    """
    assert_dump(editor(before).add_node("node.py"), after)


def test_add_node_to_empty_graph():
    before = """
    title: graph
    """
    after = """
    title: graph
    functions:
      - node_file: node.py
        id: <id>
    """
    assert_dump(editor(before).add_node("node.py"), after)


def test_add_webhook_with_all_fields():
    before = """
    title: graph
    """
    after = """
    title: graph
    functions:
      - webhook: hook
        title: n
        id: ab234567
        description_file: desc.md
    """
    assert_dump(editor(before).add_webhook("hook", "n", "ab234567", "desc.md"), after)


def test_add_store_with_all_fields():
    before = """
    title: graph
    """
    after = """
    title: graph
    stores:
      - table: st
        id: ab234567
        schema: sc
    """
    assert_dump(editor(before).add_table("st", "ab234567", "sc"), after)


def test_add_node_with_all_fields():
    before = """
    title: graph
    functions:
      - webhook: hook
    """
    after = """
    title: graph
    functions:
      - webhook: hook
      - node_file: node.py
        trigger: 1 * * * *
        inputs:
          node_in: hook
        outputs:
          node_out: my_table
        parameters:
          limit: 2
        title: my node
        id: ab234567
    """
    assert_dump(
        editor(before).add_node(
            "node.py",
            trigger="1 * * * *",
            inputs={"node_in": "hook"},
            outputs={"node_out": "my_table"},
            parameters={"limit": 2},
            title="my node",
            id="ab234567",
        ),
        after,
    )


def test_add_component_with_all_fields():
    before = """
    title: graph
    functions:
      - webhook: hook
    """
    after = """
    title: graph
    functions:
      - webhook: hook
      - uses: org/component@v1
        trigger: 1 * * * *
        inputs:
          node_in: hook
        outputs:
          node_out: my_table
        parameters:
          limit: 2
        title: my node
        id: ab234567
    """
    assert_dump(
        editor(before).add_component_uses(
            "org/component@v1",
            trigger="1 * * * *",
            inputs={"node_in": "hook"},
            outputs={"node_out": "my_table"},
            parameters={"limit": 2},
            title="my node",
            id="ab234567",
        ),
        after,
    )


def test_add_missing_node_ids():
    before = """
    functions:
      - node_file: a.py
        title: a
      - node_file: b.py
        id: foo
      - node_file: c.py
    stores:
      - table: t
      - stream: s
    """
    after = """
    functions:
      - node_file: a.py
        id: <id>
        title: a
      - node_file: b.py
        id: <id>
      - node_file: c.py
        id: <id>
    stores:
      - table: t
        id: <id>
      - stream: s
        id: <id>
    """
    # NOTE: the reference appends the id at entry END (ruyaml dict
    # append); insert-only line surgery places it directly under the
    # entry head — same semantics, position pinned by this golden.
    ed = editor(before).add_missing_node_ids()
    dump = assert_dump(ed, after)
    assert "id: foo" in dump


def test_duplicate_node_file_raises():
    ed = editor(
        """
        functions:
          - node_file: node.py
            id: ab234567
        """
    )
    with pytest.raises(ValueError, match="node.py.*already defined"):
        ed.add_node("node.py")
    with pytest.raises(ValueError, match="ab234567.*already defined"):
        ed.add_node("other.py", id="ab234567")


def test_duplicate_webhook_and_store_raise():
    ed = editor(
        """
        functions:
          - webhook: hook
        stores:
          - table: t
            id: st123456
        """
    )
    with pytest.raises(ValueError, match="hook.*already defined"):
        ed.add_webhook("hook")
    with pytest.raises(ValueError, match="'t' already defined"):
        ed.add_table("t")
    with pytest.raises(ValueError, match="st123456.*already defined"):
        ed.add_table("t2", id="st123456")


def test_set_name_and_slug_preserve_comments():
    before = """
    title: old name # keep me
    functions:
      - webhook: hook
    """
    ed = editor(before).set_name("new name")
    assert ed.get_title() == "new name"
    assert "# keep me" in ed.dump()
    ed2 = editor(before).set_slug("my-slug")
    assert ed2.get_slug() == "my-slug"
    assert ed2.dump().startswith("slug: my-slug\n")


def test_node_readers():
    ed = editor(
        """
        functions:
          - node_file: a.py
            id: aa111111
          - webhook: hook
        stores:
          - table: t
        """
    )
    funcs = list(ed.function_nodes())
    assert [f.get("node_file", f.get("webhook")) for f in funcs] == ["a.py", "hook"]
    assert [s["table"] for s in ed.store_nodes()] == ["t"]
    assert len(list(ed.all_nodes())) == 3
