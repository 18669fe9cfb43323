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


def append_function_entry(text: str, entry_lines: list[str]) -> str:
    """Append an entry to functions:, preserving the rest of the file.
    Creates the section if missing; normalizes a literal `functions: []`."""
    lines = text.splitlines(keepends=True)
    for i, line in enumerate(lines):
        if re.match(r"^functions\s*:\s*\[\s*\]\s*$", line.rstrip("\n")):
            return "".join(lines[:i] + ["functions:\n"] + [f"  {e}\n" for e in entry_lines] + lines[i + 1 :])
    for i, line in enumerate(lines):
        if re.match(r"^functions\s*:", line.rstrip("\n")):
            j = i + 1
            while j < len(lines) and (lines[j].startswith((" ", "\t", "#")) or lines[j].strip() == ""):
                j += 1
            return "".join(lines[:j] + [f"  {e}\n" for e in entry_lines] + lines[j:])
    return text + ("" if text.endswith("\n") or not text else "\n") + "functions:\n" + "".join(
        f"  {e}\n" for e in entry_lines
    )
