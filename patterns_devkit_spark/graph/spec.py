"""graph.yml -> GraphSpec: the DAG model of the reference
(reference: patterns/cli/configuration/edit.py:84-232 — functions/
stores/exposes sections, inputs/outputs port bindings, parameters,
cron triggers; node kinds per patterns/cli/commands/create.py:56-61).

Validation reproduces the reference's compile-error classes
(tests/cli/test_upload.py:40, commands/upload.py:72-81): duplicate
node ids, unconnected required inputs, unresolved template refs, and
missing-parameter errors surface as {node_id, message} dicts.
"""
from __future__ import annotations

import os
import random
import re
from dataclasses import dataclass, field
from typing import Any

import yaml

from ..node.ids import random_node_id


@dataclass
class NodeSpec:
    kind: str  # python | sql | subgraph | webhook | component | table | stream
    id: str
    name: str
    node_file: str | None = None
    webhook: str | None = None
    uses: str | None = None
    inputs: dict[str, str] = field(default_factory=dict)
    outputs: dict[str, str] = field(default_factory=dict)
    parameters: dict[str, Any] = field(default_factory=dict)
    trigger: str | None = None
    title: str | None = None
    description: str | None = None


@dataclass
class StoreSpec:
    kind: str  # table | stream
    name: str
    schema: str | dict | None = None


@dataclass
class GraphSpec:
    title: str | None
    slug: str | None
    root_dir: str
    functions: list[NodeSpec] = field(default_factory=list)
    stores: list[StoreSpec] = field(default_factory=list)
    exposes_inputs: list[str] = field(default_factory=list)
    exposes_outputs: list[str] = field(default_factory=list)

    def node_by_id(self, node_id: str) -> NodeSpec | None:
        return next((n for n in self.functions if n.id == node_id), None)

    def node_by_file(self, node_file: str) -> NodeSpec | None:
        return next((n for n in self.functions if n.node_file == node_file), None)

    def store_names(self) -> set[str]:
        names = {s.name for s in self.stores}
        # webhooks auto-create a backing table of the same name
        # (reference create.py:186-189)
        names |= {n.webhook for n in self.functions if n.kind == "webhook"}
        return names


def _node_kind(entry: dict) -> str:
    if "webhook" in entry:
        return "webhook"
    if "uses" in entry:
        return "component"
    nf = entry.get("node_file", "")
    if nf.endswith(".sql"):
        return "sql"
    if nf.endswith((".yml", ".yaml")):
        return "subgraph"
    return "python"


def parse_graph(path: str, rng: random.Random | None = None) -> GraphSpec:
    """Parse a graph.yml file (or directory containing one)."""
    if os.path.isdir(path):
        path = os.path.join(path, "graph.yml")
    with open(path) as f:
        doc = yaml.safe_load(f) or {}
    rng = rng or random.Random(0)
    spec = GraphSpec(title=doc.get("title"), slug=doc.get("slug"), root_dir=os.path.dirname(os.path.abspath(path)))
    for entry in doc.get("functions", []) or []:
        if isinstance(entry, str):
            entry = {"node_file": entry}
        kind = _node_kind(entry)
        name = entry.get("webhook") or entry.get("uses") or entry.get("node_file") or "node"
        spec.functions.append(
            NodeSpec(
                kind=kind,
                id=entry.get("id") or random_node_id(rng),
                name=name,
                node_file=entry.get("node_file"),
                webhook=entry.get("webhook"),
                uses=entry.get("uses"),
                inputs=dict(entry.get("inputs") or {}),
                outputs=dict(entry.get("outputs") or {}),
                parameters=dict(entry.get("parameters") or {}),
                trigger=entry.get("trigger"),
                title=entry.get("title"),
                description=entry.get("description"),
            )
        )
    for entry in doc.get("stores", []) or []:
        if "table" in entry:
            spec.stores.append(StoreSpec("table", entry["table"], entry.get("schema")))
        elif "stream" in entry:
            spec.stores.append(StoreSpec("stream", entry["stream"], entry.get("schema")))
        elif "view" in entry:
            # a catalog SQL view created at runtime (Engine.create_view):
            # declared so template validation knows the name; the runner
            # never ensure_table()s it
            spec.stores.append(StoreSpec("view", entry["view"], None))
    exposes = doc.get("exposes") or {}
    spec.exposes_inputs = list(exposes.get("inputs") or [])
    spec.exposes_outputs = list(exposes.get("outputs") or [])
    return spec


def _required_parameters(py_path: str) -> list[str]:
    """Static scan of a Python node file for Parameter(...) calls with
    no default — those must be bound in graph.yml (the reference
    validates this at upload; SURVEY.md §3.1)."""
    import ast

    try:
        tree = ast.parse(open(py_path).read())
    except SyntaxError:
        return []
    required = []
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "Parameter"
            and node.args
            and isinstance(node.args[0], ast.Constant)
        ):
            has_default = any(kw.arg == "default" for kw in node.keywords) or len(node.args) >= 4
            if not has_default:
                required.append(str(node.args[0].value))
    return required


_TEMPLATE_REF = re.compile(r"\{\{\s*([^}|]+?)\s*\}\}")


def sql_refs(sql_text: str) -> list[str]:
    return [m.group(1) for m in _TEMPLATE_REF.finditer(sql_text)]


def validate(spec: GraphSpec) -> list[dict]:
    """Graph compile errors as [{node_id, message}] (same classes the
    reference server reports, SURVEY.md §3.1)."""
    errors: list[dict] = []
    seen_ids: set[str] = set()
    stores = spec.store_names()
    for node in spec.functions:
        if node.id in seen_ids:
            errors.append({"node_id": node.id, "message": f"duplicate node id {node.id!r}"})
        seen_ids.add(node.id)
        for port, store in {**node.inputs, **node.outputs}.items():
            if store not in stores:
                errors.append(
                    {"node_id": node.id, "message": f"port {port!r} bound to undeclared store {store!r}"}
                )
        if node.kind == "sql" and node.node_file:
            sql_path = os.path.join(spec.root_dir, node.node_file)
            if os.path.exists(sql_path):
                with open(sql_path) as f:
                    text = f.read()
                known = stores | set(node.parameters) | {"table", "this"} | set(node.inputs) | set(node.outputs)
                for ref in sql_refs(text):
                    if ref.split(".")[0] not in known:
                        errors.append(
                            {"node_id": node.id, "message": f"unresolved template reference {{{{ {ref} }}}}"}
                        )
            else:
                errors.append({"node_id": node.id, "message": f"missing node file {node.node_file!r}"})
        if node.kind == "python" and node.node_file:
            py_path = os.path.join(spec.root_dir, node.node_file)
            if not os.path.exists(py_path):
                errors.append({"node_id": node.id, "message": f"missing node file {node.node_file!r}"})
            else:
                for pname in _required_parameters(py_path):
                    if pname not in node.parameters:
                        # reference server error text (upload.py:78-81)
                        errors.append(
                            {"node_id": node.id, "message": f"Parameter {pname!r} has no default or value"}
                        )
        if node.kind == "sql" and not node.outputs:
            errors.append({"node_id": node.id, "message": "sql node requires an output store"})
    return errors
