"""Comment-preserving graph.yml edits.

The reference's config editor round-trips graph.yml EXACTLY — comments
and formatting intact (reference patterns/cli/configuration/edit.py:
19-232, ruyaml-based; golden-string tests in
tests/configuration/test_config_editor.py:8-29,195-202). ruyaml/ruamel
aren't available here, so the same surface is implemented as line
surgery that only ever INSERTS (or, for set_name/set_slug, replaces a
single scalar line) — deletion-free edits can't disturb comments or
formatting elsewhere in the file, which is a STRONGER round-trip
guarantee than an AST rewrite.

Surface parity with the reference GraphConfigEditor:
  add_node (trigger/inputs/outputs/parameters/title/id/
  description_file, reference edit.py:101-126), add_table (:128-154),
  add_webhook (:156-173), add_component_uses (:175-200),
  add_missing_node_ids over functions AND stores (:202-207),
  set_name/get_title/set_slug/get_slug (:69-82), duplicate detection
  raising ValueError (:84-99), all_nodes/function_nodes/store_nodes
  readers (:209-232). Emitted field order and block-map layout mirror
  the reference goldens (tests/configuration/test_config_editor.py:
  89-117: node_file, trigger, inputs, outputs, parameters, title, id,
  description_file).
"""
from __future__ import annotations

import random
import re

import yaml

from ..node.ids import random_node_id

# reference edit.py:16 — distinguishes "omit the id" (None) from
# "generate one" (default)
MISSING = object()

_SECTION_ENTRY_KEYS = {
    "functions": ("node_file", "webhook", "uses"),
    "stores": ("table", "stream"),
}


def _entry_start_re(section: str) -> re.Pattern:
    keys = "|".join(_SECTION_ENTRY_KEYS[section])
    return re.compile(rf"^(\s*)-\s+({keys}):")


def _entry_blocks(lines: list[str], section: str = "functions") -> list[tuple[int, int, str]]:
    """(start, end, indent) for each list-entry block in a top-level
    section."""
    entry_re = _entry_start_re(section)
    blocks = []
    in_section = False
    start = None
    indent = ""
    for i, line in enumerate(lines + [f"{section}-end:"]):
        stripped = line.rstrip("\n")
        if re.match(rf"^{section}\s*:", stripped):
            in_section = True
            continue
        if in_section and re.match(r"^\S", stripped) and not stripped.startswith("-"):
            # left-margin key: section ended
            if start is not None:
                blocks.append((start, i, indent))
                start = None
            in_section = False
            continue
        if in_section:
            m = entry_re.match(stripped)
            if m:
                if start is not None:
                    blocks.append((start, i, indent))
                start, indent = i, m.group(1)
    return blocks


def assign_missing_ids(
    text: str,
    rng: random.Random | None = None,
    sections: tuple[str, ...] = ("functions", "stores"),
) -> tuple[str, int]:
    """Insert `id: XXXXXXXX` into function AND store entries lacking
    one (reference add_missing_node_ids covers both,
    edit.py:202-207 + test_config_editor.py:151-178); every other
    line (comments, ordering, spacing) is preserved byte-for-byte.
    Returns (new_text, n_assigned)."""
    lines = text.splitlines(keepends=True)
    if lines and not lines[-1].endswith("\n"):
        lines[-1] += "\n"
    n = 0
    out = list(lines)
    inserts: list[tuple[int, str]] = []
    for section in sections:
        for start, end, indent in _entry_blocks(lines, section):
            block = "".join(lines[start:end])
            if not re.search(r"^\s+id\s*:", block, re.M) and not re.search(r"-\s+id\s*:", block):
                node_id = random_node_id(rng)
                inserts.append((start + 1, f"{indent}  id: {node_id}\n"))
                n += 1
    for pos, line in sorted(inserts, reverse=True):
        out.insert(pos, line)
    return "".join(out), n


def _section_entry_indent(text: str, section: str) -> str:
    """Indent of existing entries in a section (reference matches the
    file's least-indented list item, edit.py:44-50); '  ' when the
    section is empty or absent."""
    lines = text.splitlines()
    entry_re = _entry_start_re(section)
    in_section = False
    for line in lines:
        if re.match(rf"^{section}\s*:", line):
            in_section = True
            continue
        if in_section and re.match(r"^\S", line) and not line.startswith("-"):
            in_section = False
            continue
        if in_section:
            m = entry_re.match(line)
            if m:
                return m.group(1)
    return "  "


def _append_section_entry(text: str, section: str, entry_lines: list[str]) -> str:
    """Append an entry to a top-level list section, preserving the rest
    of the file and matching the section's existing entry indentation.
    Creates the section if missing; normalizes a literal
    `section: []`. `entry_lines` are RELATIVE: first line '- key: v',
    continuations '  key: v'."""
    indent = _section_entry_indent(text, section)
    rendered = [f"{indent}{e}\n" for e in entry_lines]
    lines = text.splitlines(keepends=True)
    if lines and not lines[-1].endswith("\n"):
        lines[-1] += "\n"
    for i, line in enumerate(lines):
        if re.match(rf"^{section}\s*:\s*\[\s*\]\s*$", line.rstrip("\n")):
            return "".join(lines[:i] + [f"{section}:\n"] + rendered + lines[i + 1 :])
    for i, line in enumerate(lines):
        if re.match(rf"^{section}\s*:", line.rstrip("\n")):
            j = i + 1
            while j < len(lines) and (lines[j].startswith((" ", "\t", "#", "-")) or lines[j].strip() == ""):
                j += 1
            return "".join(lines[:j] + rendered + lines[j:])
    return (
        text
        + ("" if text.endswith("\n") or not text else "\n")
        + f"{section}:\n"
        + "".join(rendered)
    )


def append_function_entry(text: str, entry_lines: list[str]) -> str:
    """Append an entry to functions:, preserving the rest of the file."""
    return _append_section_entry(text, "functions", entry_lines)


def _scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _block_map(key: str, d: dict) -> list[str]:
    """Reference golden layout: block maps, two-space nesting
    (test_config_editor.py:96-101)."""
    out = [f"  {key}:"]
    out.extend(f"    {k}: {_scalar(v)}" for k, v in d.items())
    return out


class GraphConfigEditor:
    """High-level comment-preserving graph.yml editor — the reference's
    GraphConfigEditor surface (see module docstring). Every edit is
    insert-only line surgery; dump() returns the edited text."""

    def __init__(self, text: str):
        self._text = text

    # -- readers (reference edit.py:209-232) ------------------------------
    def _cfg(self) -> dict:
        return yaml.safe_load(self._text) or {}

    def get_title(self) -> str | None:
        return self._cfg().get("title")

    def get_slug(self) -> str | None:
        return self._cfg().get("slug")

    def function_nodes(self):
        nodes = self._cfg().get("functions")
        if isinstance(nodes, list):
            yield from (n for n in nodes if isinstance(n, dict))

    def store_nodes(self):
        nodes = self._cfg().get("stores")
        if isinstance(nodes, list):
            yield from (n for n in nodes if isinstance(n, dict))

    def all_nodes(self):
        yield from self.function_nodes()
        yield from self.store_nodes()

    # -- scalar setters (reference edit.py:69-78) -------------------------
    def _set_top_scalar(self, key: str, value: str) -> "GraphConfigEditor":
        lines = self._text.splitlines(keepends=True)
        for i, line in enumerate(lines):
            m = re.match(rf"^{key}\s*:.*?(\s*#.*)?$", line.rstrip("\n"))
            if m:
                comment = m.group(1) or ""
                lines[i] = f"{key}: {value}{comment}\n"
                self._text = "".join(lines)
                return self
        self._text = f"{key}: {value}\n" + self._text
        return self

    def set_name(self, name: str) -> "GraphConfigEditor":
        return self._set_top_scalar("title", name)

    def set_slug(self, slug: str) -> "GraphConfigEditor":
        return self._set_top_scalar("slug", slug)

    # -- duplicate detection (reference edit.py:84-94,143-149) ------------
    def _check_dup_function(self, d: dict) -> None:
        for k in ("node_file", "id", "webhook"):
            if d.get(k) and any(n.get(k) == d[k] for n in self.function_nodes()):
                raise ValueError(f"{k} '{d[k]}' already defined in the graph configuration")

    def _check_dup_store(self, d: dict) -> None:
        for k in ("table", "stream", "id"):
            if d.get(k) and any(n.get(k) == d[k] for n in self.store_nodes()):
                raise ValueError(f"{k} '{d[k]}' already defined in the graph configuration")

    # -- function entries -------------------------------------------------
    def _function_entry(self, lead_key: str, lead_val: str, d: dict) -> list[str]:
        """Reference field order (edit.py:114-124): trigger, inputs,
        outputs, parameters, title, id, description_file."""
        entry = [f"- {lead_key}: {lead_val}"]
        if d.get("trigger") is not None:
            entry.append(f"  trigger: {d['trigger']}")
        for key in ("inputs", "outputs", "parameters"):
            if d.get(key):
                entry.extend(_block_map(key, d[key]))
        if d.get("title") is not None:
            entry.append(f"  title: {d['title']}")
        if d.get("id") is not None:
            entry.append(f"  id: {d['id']}")
        if d.get("description_file") is not None:
            entry.append(f"  description_file: {d['description_file']}")
        return entry

    def add_node(
        self,
        node_file: str,
        trigger: str | None = None,
        inputs: dict[str, str] | None = None,
        outputs: dict[str, str] | None = None,
        parameters: dict | None = None,
        title: str | None = None,
        id: str | None = MISSING,
        description_file: str | None = None,
    ) -> "GraphConfigEditor":
        if id is MISSING:
            id = random_node_id()
        d = {
            "node_file": node_file, "trigger": trigger, "inputs": inputs,
            "outputs": outputs, "parameters": parameters, "title": title,
            "id": str(id) if id else id, "description_file": description_file,
        }
        self._check_dup_function(d)
        self._text = append_function_entry(
            self._text, self._function_entry("node_file", node_file, d)
        )
        return self

    def add_webhook(
        self,
        webhook: str,
        title: str | None = None,
        id: str | None = MISSING,
        description_file: str | None = None,
    ) -> "GraphConfigEditor":
        if id is MISSING:
            id = random_node_id()
        d = {
            "webhook": webhook, "title": title,
            "id": str(id) if id else id, "description_file": description_file,
        }
        self._check_dup_function(d)
        self._text = append_function_entry(
            self._text, self._function_entry("webhook", webhook, d)
        )
        return self

    def add_component_uses(
        self,
        component_key: str,
        trigger: str | None = None,
        inputs: dict[str, str] | None = None,
        outputs: dict[str, str] | None = None,
        parameters: dict | None = None,
        title: str | None = None,
        id: str | None = MISSING,
        description_file: str | None = None,
    ) -> "GraphConfigEditor":
        if id is MISSING:
            id = random_node_id()
        d = {
            "uses": component_key, "trigger": trigger, "inputs": inputs,
            "outputs": outputs, "parameters": parameters, "title": title,
            "id": str(id) if id else id, "description_file": description_file,
        }
        self._check_dup_function(d)
        self._text = append_function_entry(
            self._text, self._function_entry("uses", component_key, d)
        )
        return self

    # -- stores (reference edit.py:128-154) -------------------------------
    def add_table(
        self,
        name: str,
        id: str | None = MISSING,
        schema: str | dict[str, str] | None = None,
        kind: str = "table",
    ) -> "GraphConfigEditor":
        """stores: entry. `schema` is a named schema string (reference
        form, test_config_editor.py:73-86) or an inline field->type
        dict (engine extension: store-level schema declarations reach
        the catalog before any node runs, graph/runner.py)."""
        if id is MISSING:
            id = random_node_id()
        d = {"table" if kind == "table" else "stream": name, "id": str(id) if id else id}
        self._check_dup_store(d)
        entry = [f"- {kind}: {name}"]
        if d.get("id"):
            entry.append(f"  id: {d['id']}")
        if isinstance(schema, dict):
            entry.extend(_block_map("schema", schema))
        elif schema is not None:
            entry.append(f"  schema: {schema}")
        self._text = _append_section_entry(self._text, "stores", entry)
        return self

    # back-compat alias (pre-round-3 name)
    def add_store(
        self, table: str, schema: dict[str, str] | None = None, kind: str = "table"
    ) -> "GraphConfigEditor":
        return self.add_table(table, id=None, schema=schema, kind=kind)

    def add_exposed_port(self, kind: str, port: str) -> "GraphConfigEditor":
        """exposes: {inputs|outputs}: list entry (subgraph/component
        port surface)."""
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

    def add_missing_node_ids(self, rng: random.Random | None = None) -> "GraphConfigEditor":
        self._text, _ = assign_missing_ids(self._text, rng)
        return self

    # back-compat alias
    def assign_missing_ids(self, rng: random.Random | None = None) -> "GraphConfigEditor":
        return self.add_missing_node_ids(rng)

    def dump(self) -> str:
        return self._text
