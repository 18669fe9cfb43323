"""GraphRunner: executes graph.yml DAGs on the engine.

Implements the server-side runtime the reference delegates to
(SURVEY.md §3.2-§3.3): Python nodes exec with the SDK bound through a
NodeContext; SQL nodes render {{ }} templates against active table
versions and CTAS into their output store; webhook posts append to
backing tables with a patterns_request_key; data events (create/
update/reset) propagate to downstream nodes whose inputs changed; a
node can self-requeue via State.request_new_run. Subgraphs expand with
store namespacing, exposed ports mapping to outer stores
(reference tests/cli/test_upload.py:17-19, tests/graph/test_lookup.py).
"""
from __future__ import annotations

import os
import runpy
import sys
import time
import uuid
from collections import deque
from typing import Any

from ..node.node import Engine, NodeContext, Table
from .spec import GraphSpec, NodeSpec, parse_graph, validate


class GraphCompileError(Exception):
    def __init__(self, errors: list[dict]):
        super().__init__(f"graph failed to compile: {errors}")
        self.errors = errors


class GraphRunner:
    def __init__(self, engine: Engine, graph_path: str, execution_time_limit: float = 600.0):
        self.engine = engine
        self.spec = parse_graph(graph_path)
        self.execution_time_limit = execution_time_limit
        errors = validate(self.spec)
        if errors:
            raise GraphCompileError(errors)
        self._store_schemas: dict[str, Any] = {}
        self._expanded = self._expand(self.spec, prefix="")
        for store in self._stores_flat:
            self.engine.catalog.ensure_table(store)
        # store-level `schema:` declarations reach the catalog BEFORE any
        # node runs, so the declared schema wins over first-write
        # inference — reference edit.py:128-141 (stores carry schemas in
        # graph.yml) + the declared-schema-wins write contract.
        from ..node.schema import schema_dict_to_struct

        for store, schema in self._store_schemas.items():
            if isinstance(schema, dict):
                struct = schema_dict_to_struct(schema)
                self.engine.catalog.update_table_meta(
                    store,
                    schema_ddl=",".join(f"{f.name} {f.dataType.simpleString()}" for f in struct.fields),
                )
            elif isinstance(schema, str):
                # a named (marketplace) schema reference: recorded for
                # visibility; resolution needs a schema registry the
                # local engine intentionally doesn't fake
                self.engine.catalog.update_table_meta(store, schema_name=schema)
        # webhook backing tables get a default monotonic ordering so
        # handlers can consume them as streams out of the box
        for node in self._expanded:
            if node.kind == "webhook" and node.webhook:
                self.engine.catalog.update_table_meta(
                    node.webhook,
                    add_monotonic_id="patterns_id",
                    strictly_monotonic_ordering="patterns_id",
                )
        # queue entries: (node_id, request, not_before) — not_before is
        # a monotonic-clock timestamp honoring wait_atleast_seconds.
        # Clock and sleep are injectable so tests use a fake clock.
        self._run_queue: deque[tuple[str, dict | None, float]] = deque()
        self._clock = time.monotonic
        self._sleep = time.sleep
        # event-log offset persists across run_all calls: events emitted
        # between calls (e.g. webhook posts) trigger downstream nodes on
        # the next call instead of being skipped
        _, self._event_offset = self.engine.catalog.read_events(0)

    # -- graph expansion -------------------------------------------------
    def _expand(self, spec: GraphSpec, prefix: str) -> list[NodeSpec]:
        """Flatten subgraphs/components: nested store names get a
        'sub.' namespace; exposed ports bind to the outer store."""
        out: list[NodeSpec] = []
        self._stores_flat = getattr(self, "_stores_flat", set())
        # views are catalog SQL (Engine.create_view), not tables: never
        # ensure_table them or create_view would see a name collision
        self._stores_flat |= {prefix + s.name for s in spec.stores if s.kind != "view"}
        for st in spec.stores:
            if st.schema is not None:
                self._store_schemas[prefix + st.name] = st.schema
        for node in spec.functions:
            if node.kind in ("subgraph", "component"):
                sub_path = node.node_file or ""
                if node.kind == "component":
                    # org/component@v1 resolves through the versioned
                    # local registry (download semantics of
                    # services/download.py mapped to a filesystem
                    # registry; see graph/components.py)
                    from .components import resolve_component

                    sub_abs = os.path.join(
                        resolve_component(spec.root_dir, node.uses or ""), "graph.yml"
                    )
                else:
                    sub_abs = os.path.join(spec.root_dir, sub_path)
                sub_spec = parse_graph(sub_abs)
                sub_prefix = f"{prefix}{node.id}."
                port_map: dict[str, str] = {}
                for port, store in node.inputs.items():
                    port_map[port] = prefix + store
                for port, store in node.outputs.items():
                    port_map[port] = prefix + store
                expanded = self._expand(sub_spec, sub_prefix)
                for sub_node in expanded:
                    sub_node.inputs = {
                        p: port_map.get(_strip(prefixed, sub_prefix), prefixed)
                        if _strip(prefixed, sub_prefix) in sub_spec.exposes_inputs
                        else prefixed
                        for p, prefixed in sub_node.inputs.items()
                    }
                    sub_node.outputs = {
                        p: port_map.get(_strip(prefixed, sub_prefix), prefixed)
                        if _strip(prefixed, sub_prefix) in sub_spec.exposes_outputs
                        else prefixed
                        for p, prefixed in sub_node.outputs.items()
                    }
                    out.append(sub_node)
            else:
                node.inputs = {p: prefix + s for p, s in node.inputs.items()}
                node.outputs = {p: prefix + s for p, s in node.outputs.items()}
                if node.webhook:
                    node.webhook = prefix + node.webhook
                if prefix:
                    node.id = prefix + node.id
                if node.node_file and not os.path.isabs(node.node_file):
                    # resolve against the (sub)graph's own directory
                    node.node_file = os.path.join(spec.root_dir, node.node_file)
                out.append(node)
        return out

    @property
    def nodes(self) -> list[NodeSpec]:
        return self._expanded

    # -- single-node execution --------------------------------------------
    def run_node(self, node_id_or_file: str, parameters: dict[str, Any] | None = None) -> NodeContext:
        node = next(
            (n for n in self._expanded if n.id == node_id_or_file or n.node_file == node_id_or_file), None
        )
        if node is None:
            raise KeyError(f"no node {node_id_or_file!r} in graph")
        return self._execute(node, parameters)

    def _execute(self, node: NodeSpec, parameters: dict[str, Any] | None = None) -> NodeContext:
        params = {**node.parameters, **(parameters or {})}
        ctx = NodeContext(
            self.engine,
            node.id,
            inputs=node.inputs,
            outputs=node.outputs,
            parameters=params,
            execution_time_limit=self.execution_time_limit,
        )
        with ctx:
            if node.kind == "python":
                self._run_python(node, ctx)
            elif node.kind == "sql":
                self._run_sql(node, ctx)
            elif node.kind == "webhook":
                pass  # data arrives via webhook_post
            else:
                raise ValueError(f"cannot execute node kind {node.kind!r}")
        if ctx.requested_new_run is not None:
            # wait_atleast_seconds schedules the requeue at now+N (a
            # not-before timestamp, reference node.py:482-500) — NOT a
            # blocking sleep: other ready nodes keep running meanwhile.
            wait = ctx.requested_new_run.get("wait_atleast_seconds") or 0
            self._run_queue.append((node.id, ctx.requested_new_run, self._clock() + wait))
        return ctx

    def _run_python(self, node: NodeSpec, ctx: NodeContext) -> None:
        """Exec the node's .py file. `import patterns` resolves to this
        engine (reference node files use `from patterns import ...`,
        create.py:229-237)."""
        path = node.node_file or ""
        import patterns_devkit_spark as pds

        prior = sys.modules.get("patterns")
        sys.modules["patterns"] = pds
        try:
            runpy.run_path(path, run_name=f"__patterns_node_{node.id}__")
        finally:
            if prior is not None:
                sys.modules["patterns"] = prior
            else:
                sys.modules.pop("patterns", None)

    def _run_sql(self, node: NodeSpec, ctx: NodeContext) -> None:
        """SQL node: render {{ table/param }} refs, execute, write the
        result as a new version of the output store (CTAS semantics,
        SURVEY.md §3.3)."""
        path = node.node_file or ""
        with open(path) as f:
            sql_text = f.read()
        out_port = next(iter(node.outputs), None)
        if out_port is None:
            raise ValueError(f"sql node {node.id} has no output binding")
        out_table = Table(out_port, "w")
        # port-name refs resolve to their bound stores
        for port, store in {**node.inputs, **node.outputs}.items():
            sql_text = sql_text.replace("{{ " + port + " }}", "{{ " + store + " }}").replace(
                "{{" + port + "}}", "{{ " + store + " }}"
            )
        rendered = self.engine.render_sql(sql_text, this=out_table, parameters=ctx.parameters)
        result = self.engine.spark.sql(rendered)
        out_table.write_dataframe_as_new_version(result)

    # -- webhook ----------------------------------------------------------
    def webhook_post(self, name: str, payload: dict, request_key: str | None = None) -> str:
        """HTTP POST body -> record in the webhook's backing table with
        patterns_request_key added (reference create.py:177-197,
        node.py:548-550). Returns the request key."""
        node = next((n for n in self._expanded if n.kind == "webhook" and n.webhook == name), None)
        if node is None:
            raise KeyError(f"no webhook {name!r}")
        key = request_key or uuid.uuid4().hex
        record = {**payload, "patterns_request_key": key}
        ctx = NodeContext(self.engine, node.id, outputs={"out": node.webhook})
        with ctx:
            tbl = Table("out", "w")
            tbl.append(record)
        return key

    # -- orchestration -----------------------------------------------------
    def downstream_of(self, stores: set[str]) -> list[NodeSpec]:
        return [n for n in self._expanded if any(s in stores for s in n.inputs.values())]

    def run_all(self, max_steps: int = 100, include_sources: bool = True) -> list[str]:
        """Run the DAG to quiescence: start with source nodes (no
        inputs) unless include_sources=False (event-driven mode, e.g.
        the webhook server), then propagate data events to downstream
        nodes (SURVEY.md §3.3 event loop). Returns executed node ids."""
        executed: list[str] = []
        if include_sources:
            for node in self._expanded:
                if node.kind in ("python", "sql") and not node.inputs:
                    self._run_queue.append((node.id, None, 0.0))
        steps = 0
        ran_with_inputs: set[str] = set()
        while steps < max_steps:
            if not self._run_queue:
                events, self._event_offset = self.engine.catalog.read_events(self._event_offset)
                touched = {e["table"] for e in events if e["kind"] in ("create", "update")}
                if not touched:
                    break
                # materialized views fold their delta as soon as a source
                # produced a data event; the MV's own update event then
                # propagates to ITS downstream consumers like any table
                # (chains of MVs settle over successive drains)
                for mv_name in self.engine.catalog.matview_names():
                    spec = self.engine.catalog.get_matview_spec(mv_name) or {}
                    mv_sources = {spec.get("source"), spec.get("left"), spec.get("right")} - {None}
                    # refresh whenever a source was touched — even if the
                    # MV itself also appears in this event batch (e.g. a
                    # replayed history): refresh() classifies the source
                    # window itself and no-ops (0) when nothing changed,
                    # so re-entry is cheap and never double-folds
                    if mv_sources & touched and mv_name not in mv_sources:
                        if self.engine.materialized_view(mv_name).refresh() > 0:
                            touched.add(mv_name)
                for node in self.downstream_of(touched):
                    if node.kind in ("python", "sql") and node.id not in ran_with_inputs:
                        self._run_queue.append((node.id, None, 0.0))
                        ran_with_inputs.add(node.id)
                if not self._run_queue:
                    break
            # take the first READY entry; if every entry is still inside
            # its wait_atleast window, sleep exactly to the earliest
            # not-before (no 1 s cap — the full wait is honored)
            now = self._clock()
            ready_idx = next((i for i, (_, _, nb) in enumerate(self._run_queue) if nb <= now), None)
            if ready_idx is None:
                earliest = min(nb for _, _, nb in self._run_queue)
                self._sleep(max(0.0, earliest - now))
                continue
            self._run_queue.rotate(-ready_idx)
            node_id, request, _ = self._run_queue.popleft()
            self._run_queue.rotate(ready_idx)
            node = next(n for n in self._expanded if n.id == node_id)
            self._execute(node)
            executed.append(node_id)
            steps += 1
        return executed


def _strip(name: str, prefix: str) -> str:
    return name[len(prefix):] if name.startswith(prefix) else name
