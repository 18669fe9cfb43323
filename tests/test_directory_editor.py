"""GraphDirectoryEditor goldens, ported behavior-for-behavior from
reference tests/configuration/test_directory_editor.py: zip installs,
subgraph clones, FileOverwriteError protection, idempotent unchanged
installs, recursive id assignment, and the compress round-trip."""
import io
import re
import textwrap
import zipfile
from pathlib import Path

import pytest

from patterns_devkit_spark.graph.archive import (
    FileOverwriteError,
    GraphDirectoryEditor,
    compress_directory,
)


def setup_graph_files(root: Path, files: dict):
    for path, content in files.items():
        p = root / path
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(textwrap.dedent(content).strip())


def assert_files(root: Path, files: dict):
    for path, content in files.items():
        p = root / path
        assert p.is_file(), f"{p} does not exist"
        content = textwrap.dedent(content).strip()
        actual = p.read_text().strip()
        if path.endswith(".yml"):
            actual = re.sub(r"id: \w+", "id: <id>", actual)
        assert actual == content, f"{path}:\n{actual!r}\n!=\n{content!r}"
    for p in root.rglob("*"):
        name = "/".join(p.relative_to(root).parts)
        if p.is_file():
            assert name in files, f"extra file {p}"


def create_zip(files: dict) -> zipfile.ZipFile:
    b = io.BytesIO()
    with zipfile.ZipFile(b, "w") as f:
        for path, content in files.items():
            f.writestr(path, textwrap.dedent(content).strip())
    b.seek(0)
    return zipfile.ZipFile(b, "r")


def do_add_zip_test(tmp_path, before, zip, src, dst, after=None, overwrite=False):
    if before:
        setup_graph_files(tmp_path, before)
    editor = GraphDirectoryEditor(tmp_path, overwrite=overwrite)
    with create_zip(zip) as z:
        editor.add_node_from_zip(src, dst, z)
    if after:
        assert_files(tmp_path, after)


def test_add_new_node(tmp_path):
    do_add_zip_test(
        tmp_path,
        before={"graph.yml": "functions: []"},
        zip={"graph.yml": 'functions: [{"node_file": "node.py"}]', "node.py": "foo"},
        src="node.py",
        dst="new.py",
        after={
            "graph.yml": """
        functions:
          - node_file: new.py
            id: <id>
        """,
            "new.py": "foo",
        },
    )


def test_add_unchanged_node(tmp_path):
    do_add_zip_test(
        tmp_path,
        before={"graph.yml": 'functions: [{"node_file": "old.sql"}]', "old.sql": "foo"},
        zip={"graph.yml": 'functions: [{"d/node_file": "node.sql"}]', "d/node.sql": "foo"},
        src="d/node.sql",
        dst="old.sql",
        after={"graph.yml": 'functions: [{"node_file": "old.sql"}]', "old.sql": "foo"},
    )


def test_err_add_changed_node(tmp_path):
    with pytest.raises(FileOverwriteError) as exc_info:
        do_add_zip_test(
            tmp_path,
            before={"graph.yml": 'functions: [{"node_file": "old.sql"}]', "old.sql": "foo"},
            zip={"graph.yml": 'functions: [{"node_file": "node.sql"}]', "node.sql": "bar"},
            src="node.sql",
            dst="old.sql",
        )
    assert exc_info.value.file_path == tmp_path / "old.sql"


def test_overwrite_node(tmp_path):
    do_add_zip_test(
        tmp_path,
        before={"graph.yml": 'functions: [{"node_file": "old.sql"}]', "old.sql": "foo"},
        zip={"graph.yml": 'functions: [{"node_file": "node.sql"}]', "node.sql": "bar"},
        src="node.sql",
        dst="old.sql",
        after={"graph.yml": 'functions: [{"node_file": "old.sql"}]', "old.sql": "bar"},
        overwrite=True,
    )


def test_full_clone(tmp_path):
    do_add_zip_test(
        tmp_path,
        before={},
        zip={"graph.yml": 'functions: [{"node_file": "node.sql"}]', "node.sql": "bar"},
        src="graph.yml",
        dst="graph.yml",
        after={"graph.yml": 'functions: [{"node_file": "node.sql"}]', "node.sql": "bar"},
        overwrite=True,
    )


def test_add_subgraph(tmp_path):
    do_add_zip_test(
        tmp_path,
        before={
            "graph.yml": """
            functions:
              - node_file: s.sql
            """,
            "s.sql": "foo",
        },
        zip={
            "graph.yml": 'functions: [{"node_file": "sub/graph.yml"}]',
            "sub/graph.yml": 'functions: [{"node_file": "s.sql"}]',
            "sub/s.sql": "bar",
        },
        src="sub/graph.yml",
        dst="new/graph.yml",
        after={
            "graph.yml": """
            functions:
              - node_file: s.sql
              - node_file: new/graph.yml
                id: <id>
            """,
            "s.sql": "foo",
            "new/graph.yml": 'functions: [{"node_file": "s.sql"}]',
            "new/s.sql": "bar",
        },
    )


def test_add_single_file(tmp_path):
    setup_graph_files(
        tmp_path,
        {
            "graph.yml": """
        functions:
          - node_file: s.sql
        """,
            "s.sql": "foo",
        },
    )
    editor = GraphDirectoryEditor(tmp_path, overwrite=False)
    editor.add_node_from_file("new.sql", io.BytesIO(b"bar"))
    assert_files(
        tmp_path,
        {
            "graph.yml": """
         functions:
           - node_file: s.sql
           - node_file: new.sql
             id: <id>
         """,
            "s.sql": "foo",
            "new.sql": "bar",
        },
    )


def test_add_missing_node_ids_recursive(tmp_path):
    setup_graph_files(
        tmp_path,
        {
            "graph.yml": """
        functions:
          - node_file: s.sql
          - node_file: sub/graph.yml
        """,
            "s.sql": "foo",
            "sub/graph.yml": """
        functions:
          - node_file: s.sql
        """,
            "sub/s.sql": "foo",
        },
    )
    GraphDirectoryEditor(tmp_path, overwrite=True).add_missing_node_ids()
    assert_files(
        tmp_path,
        {
            "graph.yml": """
        functions:
          - node_file: s.sql
            id: <id>
          - node_file: sub/graph.yml
            id: <id>
        """,
            "s.sql": "foo",
            "sub/graph.yml": """
        functions:
          - node_file: s.sql
            id: <id>
        """,
            "sub/s.sql": "foo",
        },
    )


def test_compress_round_trip_respects_ignores(tmp_path):
    setup_graph_files(
        tmp_path,
        {
            "graph.yml": "functions: []",
            "node.py": "x = 1",
            ".gitignore": "secret.txt\n*.log\n",
            "secret.txt": "no",
            "run.log": "no",
            "sub/keep.sql": "select 1",
        },
    )
    (tmp_path / "__pycache__").mkdir()
    (tmp_path / "__pycache__" / "node.cpython-311.pyc").write_text("no")
    buf = compress_directory(tmp_path)
    assert buf.name == "graph_manifest.zip"
    with zipfile.ZipFile(buf) as zf:
        names = set(zf.namelist())
    assert names == {"graph.yml", "node.py", ".gitignore", "sub/keep.sql"}
    # round-trip: extract into a fresh dir via the editor, bytes intact
    buf.seek(0)
    dst = tmp_path / "clone"
    dst.mkdir()
    GraphDirectoryEditor(dst, overwrite=True).add_node_from_zip("graph.yml", "graph.yml", buf)
    assert (dst / "node.py").read_text() == "x = 1"
    assert (dst / "sub" / "keep.sql").read_text() == "select 1"


def test_graph_slug(tmp_path):
    d = tmp_path / "My App_2"
    d.mkdir()
    (d / "graph.yml").write_text("title: x\n")
    assert GraphDirectoryEditor(d).graph_slug() == "My-App-2"
    (d / "graph.yml").write_text("slug: custom_slug\n")
    assert GraphDirectoryEditor(d).graph_slug() == "custom-slug"
