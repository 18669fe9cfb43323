"""Zip-based graph packaging: GraphDirectoryEditor + overwrite
protection.

Mirrors reference patterns/cli/configuration/edit.py:235-379
(GraphDirectoryEditor, FileOverwriteError) and
patterns/cli/helpers.py:100-125 (compress_directory respecting
ignore rules): a graph directory round-trips through an in-memory zip,
single nodes or whole subgraphs install out of an archive into a graph
directory, and — unless overwrite is requested — installing NEVER
clobbers a local file whose content differs (writing identical content
is a no-op, so re-installs are idempotent). Golden behavior pinned by
tests/test_directory_editor.py, ported from reference
tests/configuration/test_directory_editor.py.
"""
from __future__ import annotations

import fnmatch
import io
import os
import re
import zipfile
from pathlib import Path
from typing import IO, Iterator, Union

from .edit import GraphConfigEditor

_IGNORE_DIRS = {".git", "__pycache__", ".venv", "node_modules"}
_IGNORE_FILES = ("*.pyc", ".DS_Store")


class FileOverwriteError(Exception):
    """Install would clobber a local file whose content differs
    (reference edit.py:372-375)."""

    def __init__(self, file_path: Path, message: str) -> None:
        super().__init__(message)
        self.file_path = file_path


def resolve_graph_path(path: Path, exists: bool) -> Path:
    """Resolve a graph location (dir or yml file) to its graph.yml
    (reference services/graph_path.py)."""
    path = Path(path)
    if path.is_dir():
        f = path / "graph.yml"
        if f.is_file():
            if exists:
                return f.absolute()
            raise ValueError(f"File '{f}' already exists")
        if exists:
            raise ValueError(f"File '{f}' does not exist")
        return f.absolute()
    if path.suffix and path.suffix not in (".yml", ".yaml"):
        raise ValueError(f"Invalid graph file name: {path.name}")
    if path.is_file():
        if not exists:
            raise ValueError(f"Graph '{path}' already exists")
        return path.absolute()
    if exists:
        raise ValueError(f"Graph '{path}' does not exist")
    return (path / "graph.yml").absolute() if not path.suffix else path.absolute()


def _gitignore_globs(directory: Path) -> list[str]:
    globs: list[str] = []
    gi = directory / ".gitignore"
    if gi.is_file():
        for line in gi.read_text().splitlines():
            line = line.strip().rstrip("/")
            if line and not line.startswith("#"):
                globs.append(line)
    return globs


def directory_contents_to_upload(directory: Path) -> Iterator[Path]:
    """Package-worthy files: walk skipping VCS/cache dirs and
    .gitignore globs (reference helpers.py:100-113; the reference
    shells out to `git ls-files` inside a repo — a plain fnmatch pass
    keeps the same contract without requiring git)."""
    directory = Path(directory)
    globs = _gitignore_globs(directory)

    def ignored(rel: str, name: str) -> bool:
        if any(fnmatch.fnmatch(name, g) for g in _IGNORE_FILES):
            return True
        return any(
            fnmatch.fnmatch(rel, g) or fnmatch.fnmatch(name, g) for g in globs
        )

    for dirname, dirnames, files in os.walk(directory, followlinks=True):
        rel_dir = os.path.relpath(dirname, directory)
        dirnames[:] = [
            d
            for d in dirnames
            if d not in _IGNORE_DIRS
            and not ignored(os.path.normpath(os.path.join(rel_dir, d)), d)
        ]
        for f in files:
            rel = os.path.normpath(os.path.join(rel_dir, f))
            if not ignored(rel, f):
                yield Path(dirname) / f


def compress_directory(directory: Path) -> io.BytesIO:
    """In-memory zip of the graph directory (reference
    helpers.py:116-125)."""
    directory = Path(directory)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for f in sorted(directory_contents_to_upload(directory)):
            zf.write(f, str(f.relative_to(directory)))
    buf.seek(0)
    buf.name = "graph_manifest.zip"
    return buf


def _zip_name(p: Path) -> str:
    return "/".join(p.parts)


class GraphDirectoryEditor:
    """Install nodes/subgraphs from zips or files into a graph
    directory, updating graph.yml, with per-file overwrite protection
    (reference edit.py:235-369)."""

    def __init__(self, graph_path: Union[Path, str], overwrite: bool = False):
        graph_path = Path(graph_path)
        try:
            self.yml_path = resolve_graph_path(graph_path, exists=True)
        except ValueError:
            self.yml_path = resolve_graph_path(graph_path, exists=False)
        self.dir = self.yml_path.parent
        self.overwrite = overwrite

    def _cfg_editor(self) -> GraphConfigEditor | None:
        if self.yml_path.is_file():
            return GraphConfigEditor(self.yml_path.read_text())
        return None

    def graph_slug(self) -> str:
        """Graph name slug: yaml slug, else directory name
        (reference edit.py:253-259)."""
        cfg = self._cfg_editor()
        name = (cfg.get_slug() if cfg else None) or self.yml_path.parent.name
        return re.sub(r"[^a-zA-Z0-9]", "-", name)

    def compress_directory(self) -> io.BytesIO:
        return compress_directory(self.dir)

    def add_node_from_file(self, dst_path: Union[Path, str], file: IO[bytes]) -> "GraphDirectoryEditor":
        """Write a file's content to dst_path and declare it in
        graph.yml (reference edit.py:265-273)."""
        dst_path = Path(dst_path)
        self._write_file(dst_path, file)
        self._add_cfg_node(dst_path)
        return self

    def add_node_from_zip(
        self,
        src_path: Union[Path, str],
        dst_path: Union[Path, str],
        zf: Union[zipfile.ZipFile, Path, IO[bytes]],
    ) -> "GraphDirectoryEditor":
        """Copy the node (or, when src is a graph.yml, the whole
        subgraph directory) from the archive to dst_path (reference
        edit.py:275-294)."""
        src_path = Path(src_path)
        dst_path = Path(dst_path)
        if isinstance(zf, zipfile.ZipFile):
            self._add(src_path, dst_path, zf)
        else:
            with zipfile.ZipFile(zf, "r") as f:
                self._add(src_path, dst_path, f)
        return self

    def add_missing_node_ids(self) -> "GraphDirectoryEditor":
        """Assign ids in every graph.yml under the directory
        (reference edit.py:296-304)."""
        for p in sorted(self.dir.rglob("graph.yml")):
            ed = GraphConfigEditor(p.read_text()).add_missing_node_ids()
            p.write_text(ed.dump())
        return self

    # -- internals --------------------------------------------------------
    def _add(self, src_path: Path, dst_path: Path, zf: zipfile.ZipFile) -> None:
        if src_path.name == "graph.yml":

            def dirname(p: Path) -> str:
                if len(p.parts) <= 1:
                    return ""
                return _zip_name(p.parent) + "/"

            src_dir = dirname(src_path)
            dst_dir = dirname(dst_path)
            for info in zf.infolist():
                if info.filename.startswith(src_dir) and not info.is_dir():
                    new_name = dst_dir + info.filename[len(src_dir):]
                    self._extract_file(info, Path(new_name), zf)
        else:
            self._extract_file(zf.getinfo(_zip_name(src_path)), dst_path, zf)
        self._add_cfg_node(dst_path)

    def _add_cfg_node(self, dst_path: Path) -> None:
        cfg = self._cfg_editor()
        if cfg is None or str(dst_path) == "graph.yml":
            return
        try:
            self.yml_path.write_text(cfg.add_node(_zip_name(dst_path)).dump())
        except ValueError:
            pass  # node already declared, leave it unchanged

    def _extract_file(self, member: zipfile.ZipInfo, dst_path: Path, zf: zipfile.ZipFile) -> None:
        full = self.dir / dst_path
        if full.is_dir():
            raise ValueError(f"Cannot extract {dst_path}: a directory by that name exists")
        with zf.open(member, "r") as f:
            self._write_file(dst_path, f)

    def _write_file(self, dst_path: Path, file: IO[bytes]) -> None:
        full = self.dir / dst_path
        new_content = io.TextIOWrapper(file).read()
        if not self.overwrite and full.is_file():
            if full.read_text() != new_content:
                raise FileOverwriteError(
                    full, f"Cannot extract {dst_path}: would overwrite existing file"
                )
        full.parent.mkdir(parents=True, exist_ok=True)
        full.write_text(new_content)
