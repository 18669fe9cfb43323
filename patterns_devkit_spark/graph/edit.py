"""Comment-preserving graph.yml edits.

The reference's config editor round-trips graph.yml EXACTLY — comments
and formatting intact (reference: ruyaml-based edit.py; golden-string
tests in tests/configuration/test_config_editor.py:8-29,195-202).
ruyaml/ruamel aren't available here, so the two mutation operations
the CLI needs are implemented as line-surgery that leaves every other
byte untouched:

- assign_missing_ids: insert an `id:` line into each functions-list
  entry that lacks one (what upload does before packaging,
  reference edit.py:296-304).
- append_function_entry: add a node entry to the functions: list.
"""
from __future__ import annotations

import random
import re

from ..node.ids import random_node_id

_ENTRY_START = re.compile(r"^(\s*)-\s+(node_file|webhook|uses):")


def _entry_blocks(lines: list[str]) -> list[tuple[int, int, str]]:
    """(start, end, indent) for each functions-list entry block."""
    blocks = []
    in_functions = False
    func_indent = None
    start = None
    indent = ""
    for i, line in enumerate(lines + ["functions-end:"]):
        stripped = line.rstrip("\n")
        if re.match(r"^functions\s*:", stripped):
            in_functions = True
            continue
        if in_functions and re.match(r"^\S", stripped) and not stripped.startswith("-"):
            # left-margin key: functions section ended
            if start is not None:
                blocks.append((start, i, indent))
                start = None
            in_functions = False
            continue
        if in_functions:
            m = _ENTRY_START.match(stripped)
            if m:
                if start is not None:
                    blocks.append((start, i, indent))
                start, indent = i, m.group(1)
    return blocks


def assign_missing_ids(text: str, rng: random.Random | None = None) -> tuple[str, int]:
    """Insert `id: XXXXXXXX` into entries lacking one; every other line
    (comments, ordering, spacing) is preserved byte-for-byte. Returns
    (new_text, n_assigned)."""
    lines = text.splitlines(keepends=True)
    n = 0
    out = list(lines)
    inserts: list[tuple[int, str]] = []
    for start, end, indent in _entry_blocks(lines):
        block = "".join(lines[start:end])
        if not re.search(r"^\s+id\s*:", block, re.M) and not re.search(r"-\s+id\s*:", block):
            node_id = random_node_id(rng)
            inserts.append((start + 1, f"{indent}  id: {node_id}\n"))
            n += 1
    for pos, line in sorted(inserts, reverse=True):
        out.insert(pos, line)
    return "".join(out), n


def _append_section_entry(text: str, section: str, entry_lines: list[str]) -> str:
    """Append an entry to a top-level list section, preserving the rest
    of the file. Creates the section if missing; normalizes a literal
    `section: []`."""
    lines = text.splitlines(keepends=True)
    for i, line in enumerate(lines):
        if re.match(rf"^{section}\s*:\s*\[\s*\]\s*$", line.rstrip("\n")):
            return "".join(
                lines[:i] + [f"{section}:\n"] + [f"  {e}\n" for e in entry_lines] + lines[i + 1 :]
            )
    for i, line in enumerate(lines):
        if re.match(rf"^{section}\s*:", line.rstrip("\n")):
            j = i + 1
            while j < len(lines) and (lines[j].startswith((" ", "\t", "#")) or lines[j].strip() == ""):
                j += 1
            return "".join(lines[:j] + [f"  {e}\n" for e in entry_lines] + lines[j:])
    return text + ("" if text.endswith("\n") or not text else "\n") + f"{section}:\n" + "".join(
        f"  {e}\n" for e in entry_lines
    )


def append_function_entry(text: str, entry_lines: list[str]) -> str:
    """Append an entry to functions:, preserving the rest of the file."""
    return _append_section_entry(text, "functions", entry_lines)


def _flow_map(d: dict | None) -> str:
    return "{" + ", ".join(f"{k}: {v}" for k, v in (d or {}).items()) + "}"


class GraphConfigEditor:
    """High-level comment-preserving graph.yml editor — the reference's
    GraphConfigEditor surface (reference patterns/cli/configuration/
    edit.py:84-232: add_node/add_webhook/add_component_uses/
    add_store_with_schema/add_exposed_port, fluent, dump round-trips
    untouched regions byte-for-byte). The reference mutates a ruyaml
    AST; ruamel isn't available here, so every edit is line surgery
    that only ever INSERTS lines — deletion-free edits can't disturb
    comments or formatting elsewhere in the file."""

    def __init__(self, text: str):
        self._text = text

    # -- function entries -------------------------------------------------
    def add_node(
        self,
        node_file: str,
        id: str | None = None,
        inputs: dict[str, str] | None = None,
        outputs: dict[str, str] | None = None,
        parameters: dict | None = None,
        title: str | None = None,
    ) -> "GraphConfigEditor":
        entry = [f"- node_file: {node_file}"]
        if id:
            entry.append(f"  id: {id}")
        if title:
            entry.append(f"  title: {title}")
        if inputs:
            entry.append(f"  inputs: {_flow_map(inputs)}")
        if outputs:
            entry.append(f"  outputs: {_flow_map(outputs)}")
        if parameters:
            entry.append("  parameters:")
            entry.extend(f"    {k}: {v}" for k, v in parameters.items())
        self._text = append_function_entry(self._text, entry)
        return self

    def add_webhook(self, name: str, id: str | None = None) -> "GraphConfigEditor":
        entry = [f"- webhook: {name}"]
        if id:
            entry.append(f"  id: {id}")
        self._text = append_function_entry(self._text, entry)
        return self

    def add_component_uses(
        self,
        uses: str,
        id: str | None = None,
        inputs: dict[str, str] | None = None,
        outputs: dict[str, str] | None = None,
    ) -> "GraphConfigEditor":
        entry = [f"- uses: {uses}"]
        if id:
            entry.append(f"  id: {id}")
        if inputs:
            entry.append(f"  inputs: {_flow_map(inputs)}")
        if outputs:
            entry.append(f"  outputs: {_flow_map(outputs)}")
        self._text = append_function_entry(self._text, entry)
        return self

    # -- stores / exposes -------------------------------------------------
    def add_store(
        self, table: str, schema: dict[str, str] | None = None, kind: str = "table"
    ) -> "GraphConfigEditor":
        """stores: entry, optionally with an inline field->type schema
        (reference edit.py:128-141 attaches schemas to store decls)."""
        entry = [f"- {kind}: {table}"]
        if schema:
            entry.append("  schema:")
            entry.extend(f"    {k}: {v}" for k, v in schema.items())
        self._text = _append_section_entry(self._text, "stores", entry)
        return self

    def add_exposed_port(self, kind: str, port: str) -> "GraphConfigEditor":
        """exposes: {inputs|outputs}: list entry (subgraph/component
        port surface, reference edit.py exposed-port edits)."""
        if kind not in ("inputs", "outputs"):
            raise ValueError("kind must be 'inputs' or 'outputs'")
        lines = self._text.splitlines(keepends=True)
        in_exposes = False
        for i, line in enumerate(lines):
            s = line.rstrip("\n")
            if re.match(r"^exposes\s*:", s):
                in_exposes = True
                continue
            if in_exposes and re.match(r"^\S", s):
                in_exposes = False
            if in_exposes and re.match(rf"^\s+{kind}\s*:", s):
                m = re.match(rf"^(\s+){kind}\s*:\s*\[(.*)\]\s*$", s)
                if m:  # flow list: rewrite this one line
                    items = [x.strip() for x in m.group(2).split(",") if x.strip()]
                    items.append(port)
                    lines[i] = f"{m.group(1)}{kind}: [{', '.join(items)}]\n"
                    self._text = "".join(lines)
                    return self
                j = i + 1
                while j < len(lines) and re.match(r"^\s+-\s", lines[j]):
                    j += 1
                indent = re.match(r"^(\s+)", lines[i]).group(1)
                lines.insert(j, f"{indent}  - {port}\n")
                self._text = "".join(lines)
                return self
        # exposes: exists without the target list, or is missing entirely
        if re.search(r"^exposes\s*:", self._text, re.M):
            lines = self._text.splitlines(keepends=True)
            for i, line in enumerate(lines):
                if re.match(r"^exposes\s*:", line.rstrip("\n")):
                    lines.insert(i + 1, f"  {kind}:\n    - {port}\n")
                    break
            self._text = "".join(lines)
        else:
            self._text = (
                self._text
                + ("" if self._text.endswith("\n") else "\n")
                + f"exposes:\n  {kind}:\n    - {port}\n"
            )
        return self

    def assign_missing_ids(self, rng: random.Random | None = None) -> "GraphConfigEditor":
        self._text, _ = assign_missing_ids(self._text, rng)
        return self

    def dump(self) -> str:
        return self._text
