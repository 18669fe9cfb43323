"""patterns-compatible CLI over the local Spark engine.

Mirrors the reference's command surface (reference:
patterns/cli/main.py:79-95 — create, upload, download, trigger,
delete, list, config) but the "server" is the local engine: upload is
a graph compile + registration, trigger executes the node on Spark,
list reads the catalog. Graph discovery walks up from the CWD like
the reference's IdLookup (services/lookup.py:213-250).

Usage: python -m patterns_devkit_spark.cli <command> ...
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import textwrap

GRAPH_TEMPLATE = """title: {title}
functions: []
stores: []
"""

PY_NODE_TEMPLATE = '''from patterns import Parameter, State, Table

# input_table = Table("input_port", "r")
# output_table = Table("output_port", "w")
# my_param = Parameter("my_param", type=str, default="x")
'''

SQL_NODE_TEMPLATE = """-- Type '{{ store_or_parameter }}' to reference Tables and Parameters
SELECT 1 AS one
"""


def find_graph_root(start: str | None = None) -> str | None:
    """Walk up from start dir to the nearest graph.yml (reference
    services/lookup.py:213-250)."""
    d = os.path.abspath(start or os.getcwd())
    while True:
        if os.path.exists(os.path.join(d, "graph.yml")):
            return d
        parent = os.path.dirname(d)
        if parent == d:
            return None
        d = parent


def _warehouse(args) -> str:
    return args.warehouse or os.environ.get("PATTERNS_WAREHOUSE", os.path.expanduser("~/.patterns-spark/warehouse"))


def _engine(args):
    from .node.node import Engine

    return Engine(_warehouse(args))


def cmd_create(args) -> int:
    if args.what == "app":
        os.makedirs(args.name, exist_ok=False)
        with open(os.path.join(args.name, "graph.yml"), "w") as f:
            f.write(GRAPH_TEMPLATE.format(title=args.name))
        print(f"Created app {args.name}/ with graph.yml")
        return 0
    if args.what == "node":
        root = find_graph_root()
        if root is None:
            print("error: no graph.yml found (run inside an app)", file=sys.stderr)
            return 1
        from .graph.edit import append_function_entry

        gpath = os.path.join(root, "graph.yml")
        text = open(gpath).read()
        name = args.name
        if args.webhook:
            text = append_function_entry(text, [f"- webhook: {name}"])
        else:
            path = os.path.join(root, name)
            if not os.path.exists(path):
                with open(path, "w") as f:
                    f.write(SQL_NODE_TEMPLATE if name.endswith(".sql") else PY_NODE_TEMPLATE)
            text = append_function_entry(text, [f"- node_file: {name}"])
        with open(gpath, "w") as f:
            f.write(text)
        print(f"Added {'webhook' if args.webhook else 'node'} {name}")
        return 0
    print(f"error: cannot create {args.what!r}", file=sys.stderr)
    return 1


def cmd_upload(args) -> int:
    """Compile + register the graph (the reference zips to the server;
    ours validates and assigns missing node ids in place)."""
    from .graph.spec import parse_graph, validate

    from .graph.edit import assign_missing_ids

    root = find_graph_root(args.path)
    if root is None:
        print("error: no graph.yml found", file=sys.stderr)
        return 1
    gpath = os.path.join(root, "graph.yml")
    text = open(gpath).read()
    new_text, n_assigned = assign_missing_ids(text)
    if n_assigned:
        with open(gpath, "w") as f:
            f.write(new_text)  # comment/format-preserving id insertion
    spec = parse_graph(root)
    errors = validate(spec)
    if errors:
        print("Graph errored with the following messages:")
        for e in errors:
            print(f"  node {e['node_id']}: {e['message']}")
        return 1
    # register: package the app dir as a zip manifest and install it
    # into the warehouse registry — the same compress -> extract
    # round-trip the reference ships to its server (reference
    # helpers.py:116-125 + edit.py:261-263), with .gitignore globs
    # respected by the packager (graph/archive.py)
    import shutil

    from .graph.archive import GraphDirectoryEditor, compress_directory

    slug = spec.slug or os.path.basename(root)
    dest = os.path.join(_warehouse(args), "apps", slug)
    manifest = compress_directory(root)
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    os.makedirs(dest, exist_ok=True)
    GraphDirectoryEditor(dest, overwrite=True).add_node_from_zip(
        "graph.yml", "graph.yml", manifest
    )
    print(f"Uploaded graph {spec.title or slug!r}: {len(spec.functions)} nodes OK")
    return 0


def cmd_trigger(args) -> int:
    from .graph.runner import GraphRunner

    root = find_graph_root(args.node and os.path.dirname(os.path.abspath(args.node)) or None)
    if root is None:
        print("error: no graph.yml found", file=sys.stderr)
        return 1
    engine = _engine(args)
    runner = GraphRunner(engine, root)
    target = os.path.basename(args.node) if args.node.endswith((".py", ".sql")) else args.node
    node = next((n for n in runner.nodes if n.id == target or (n.node_file or "").endswith(target)), None)
    if node is None:
        print(f"error: no node {args.node!r}", file=sys.stderr)
        return 1
    runner.run_node(node.id)
    if args.downstream:
        runner.run_all()
    print(f"Triggered node {node.id}")
    return 0


def cmd_run(args) -> int:
    from .graph.runner import GraphRunner

    root = find_graph_root(args.path)
    if root is None:
        print("error: no graph.yml found", file=sys.stderr)
        return 1
    runner = GraphRunner(_engine(args), root)
    executed = runner.run_all()
    print(f"Executed {len(executed)} node runs: {executed}")
    return 0


def _print_objects(name: str, objects: list[dict], print_json: bool) -> None:
    """Reference output semantics (commands/list.py:82-98 +
    services/output.py): ``--json`` emits one JSON object per line
    (JSON Lines); otherwise an aligned header+rows table; an empty
    list prints 'No <name> found'."""
    if not objects:
        if not print_json:
            print(f"No {name} found")
        return
    if print_json:
        for o in objects:
            print(json.dumps(o, default=str))
        return
    headers = list(objects[0].keys())
    rows = [[("" if o.get(h) is None else str(o.get(h))) for h in headers] for o in objects]
    widths = [max(len(h), *(len(r[i]) for r in rows)) for i, h in enumerate(headers)]
    print("  ".join(h.ljust(w) for h, w in zip(headers, widths)).rstrip())
    for r in rows:
        print("  ".join(c.ljust(w) for c, w in zip(r, widths)).rstrip())


def cmd_list(args) -> int:
    engine = _engine(args)
    pj = getattr(args, "json", False)
    cat = engine.catalog
    if args.what == "tables":
        rows = []
        for name in cat.table_names():
            meta = cat.table_meta(name)
            av = meta.get("active_version")
            rows.append(
                {
                    "name": name,
                    "active": av,
                    "rows": meta.get("record_counts", {}).get(av),
                    "versions": len(meta.get("versions", [])),
                }
            )
        _print_objects("tables", rows, pj)
    elif args.what == "nodes":
        root = find_graph_root()
        if root is None:
            print("error: no graph.yml found", file=sys.stderr)
            return 1
        from .graph.spec import parse_graph

        _print_objects(
            "nodes",
            [{"id": n.id, "kind": n.kind, "name": n.name} for n in parse_graph(root).functions],
            pj,
        )
    elif args.what == "webhooks":
        # reference `list webhooks` (commands/list.py:69-77) lists an
        # app's webhook nodes; here: graph.yml webhook functions plus
        # their backing table state
        root = find_graph_root()
        if root is None:
            print("error: no graph.yml found", file=sys.stderr)
            return 1
        from .graph.spec import parse_graph

        rows = []
        for n in parse_graph(root).functions:
            if n.kind != "webhook":
                continue
            meta = cat.table_meta(n.webhook) or {}
            av = meta.get("active_version")
            rows.append(
                {
                    "id": n.id,
                    "name": n.webhook,
                    "table": n.webhook,
                    "rows": meta.get("record_counts", {}).get(av),
                }
            )
        _print_objects("webhooks", rows, pj)
    elif args.what == "secrets":
        # reference `list secrets` (commands/list.py:53-66): names only
        # here — values never leave the catalog in a listing
        _print_objects(
            "secrets",
            [
                {"name": s, "n_keys": len(cat.get_secret(s) or {})}
                for s in cat.secret_names()
            ],
            pj,
        )
    elif args.what == "views":
        _print_objects(
            "views",
            [{"name": v, "sql": (cat.get_view(v) or "").strip().replace("\n", " ")[:60]} for v in cat.view_names()],
            pj,
        )
    elif args.what == "matviews":
        rows = []
        for name in cat.matview_names():
            spec = cat.get_matview_spec(name) or {}
            src = (
                f"{spec.get('left')}+{spec.get('right')}"
                if spec.get("type") == "join"
                else spec.get("source")
            )
            av = cat.get_active_version(name)
            meta = cat.table_meta(name) or {}
            rows.append(
                {
                    "name": name,
                    "source": src,
                    "dims": ",".join(spec.get("dims") or []),
                    "rows": meta.get("record_counts", {}).get(av),
                }
            )
        _print_objects("matviews", rows, pj)
    elif args.what == "tags":
        rows = []
        for name in cat.table_names():
            for tg, vid in sorted(cat.tags(name).items()):
                rows.append({"table": name, "tag": tg, "version": vid})
        _print_objects("tags", rows, pj)
    return 0


def cmd_delete(args) -> int:
    engine = _engine(args)
    meta = engine.catalog.table_meta(args.table)
    if meta is None:
        print(f"error: no table {args.table!r}", file=sys.stderr)
        return 1
    # ref-counted: files a clone in another table still references survive
    engine.catalog.drop_table(args.table)
    print(f"Deleted table {args.table}")
    return 0


def cmd_download(args) -> int:
    """Extract a registered app out of the warehouse through the zip
    editor (reference download): per-FILE overwrite protection —
    identical local files are left alone, a DIFFERING local file
    aborts with its path unless --force (FileOverwriteError semantics,
    reference edit.py:346-361)."""
    from .graph.archive import FileOverwriteError, GraphDirectoryEditor, compress_directory

    src = os.path.join(_warehouse(args), "apps", args.slug)
    if not os.path.isdir(src):
        print(f"error: no registered app {args.slug!r}", file=sys.stderr)
        return 1
    dest = args.dest or args.slug
    os.makedirs(dest, exist_ok=True)
    manifest = compress_directory(src)
    try:
        GraphDirectoryEditor(dest, overwrite=args.force).add_node_from_zip(
            "graph.yml", "graph.yml", manifest
        )
    except FileOverwriteError as e:
        print(
            f"error: would overwrite local edits in {e.file_path} (use --force)",
            file=sys.stderr,
        )
        return 1
    print(f"Downloaded {args.slug} -> {dest}")
    return 0


def cmd_diff(args) -> int:
    """Diff the working app dir against its registered copy (reference
    upload conflict check, services/diffs.py)."""
    import difflib

    root = find_graph_root(args.path)
    if root is None:
        print("error: no graph.yml found", file=sys.stderr)
        return 1
    from .graph.spec import parse_graph

    slug = parse_graph(root).slug or os.path.basename(root)
    reg = os.path.join(_warehouse(args), "apps", slug)
    if not os.path.isdir(reg):
        print(f"no registered copy of {slug!r} (nothing uploaded yet)")
        return 1
    changed = False
    local_files = {
        os.path.relpath(os.path.join(dp, f), root)
        for dp, _, fs in os.walk(root)
        for f in fs
        if "__pycache__" not in dp
    }
    reg_files = {
        os.path.relpath(os.path.join(dp, f), reg) for dp, _, fs in os.walk(reg) for f in fs
    }
    for rel in sorted(local_files | reg_files):
        lp, rp = os.path.join(root, rel), os.path.join(reg, rel)
        if not os.path.exists(rp):
            print(f"added: {rel}")
            changed = True
        elif not os.path.exists(lp):
            print(f"removed: {rel}")
            changed = True
        else:
            try:
                a, b = open(rp).read().splitlines(), open(lp).read().splitlines()
            except UnicodeDecodeError:
                if open(rp, "rb").read() != open(lp, "rb").read():
                    print(f"changed (binary): {rel}")
                    changed = True
                continue
            diff = list(difflib.unified_diff(a, b, fromfile=f"registered/{rel}", tofile=f"local/{rel}", lineterm=""))
            if diff:
                print("\n".join(diff))
                changed = True
    if not changed:
        print("no changes")
    return 0


def cmd_secret(args) -> int:
    engine = _engine(args)
    if args.action == "set":
        values = dict(kv.split("=", 1) for kv in args.values)
        engine.set_secret(args.name, values)
        print(f"Stored secret {args.name}")
    else:
        v = engine.get_secret(args.name)
        print(json.dumps(v) if v is not None else f"no secret {args.name!r}", file=sys.stdout)
    return 0


def cmd_vacuum(args) -> int:
    """Retention GC: drop inactive table versions beyond each table's
    retention policy (reference node.py:403-404). With --orphans,
    also sweep files no retained manifest references (crash leftovers
    of the metadata-first delete ordering), honoring --grace."""
    engine = _engine(args)
    for name in engine.catalog.table_names():
        dropped = engine.catalog.gc_versions(name)
        if dropped:
            print(f"{name}: dropped {dropped}")
    if getattr(args, "orphans", False):
        swept = engine.catalog.vacuum_orphans(grace_seconds=args.grace)
        if swept:
            print(f"orphan files swept: {len(swept)}")
    print("vacuum complete")
    return 0


def cmd_tag(args) -> int:
    """Version tags: named, GC-exempt pins (Iceberg-style). With no
    tag name, list the table's tags; with --drop, remove one; else pin
    the tag to --version (default: the active version). Read a tag
    back via {{ table@tag }} or read_spark(version=tag)."""
    engine = _engine(args)
    cat = engine.catalog
    if not args.tag:
        for tg, vid in sorted(cat.tags(args.table).items()):
            print(f"{tg}\t{vid}")
        return 0
    if args.drop:
        cat.drop_tag(args.table, args.tag)
        print(f"dropped tag {args.tag!r} from {args.table}")
        return 0
    vid = args.version or cat.get_active_version(args.table)
    if vid is None:
        print(f"error: table {args.table!r} has no version to tag", file=sys.stderr)
        return 1
    cat.set_tag(args.table, args.tag, vid)
    print(f"tagged {args.table}@{vid} as {args.tag!r}")
    return 0


def cmd_branch(args) -> int:
    """Table branches (Nessie-style workflow on engine tables): with
    no branch name, list the table's branches; --merge lands a branch
    back on main (CDC batch from the fork point; --on-conflict
    error|branch_wins|main_wins); --sync catches the branch up with
    main (the reverse feed, moving the fork point); --drop abandons
    one; else fork a new branch (zero-copy clone + GC-exempt fork
    markers). Branch tables carry the full SDK/SQL surface under the
    printed store name."""
    engine = _engine(args)
    if not args.branch:
        for br, info in sorted(engine.list_branches(args.table).items()):
            print(f"{br}\t{info['table']}\tfork={info['fork_main']}")
        return 0
    if args.merge:
        n = engine.merge_branch(args.table, args.branch, on_conflict=args.on_conflict)
        print(f"merged branch {args.branch!r} into {args.table}: {n} change rows")
        return 0
    if args.sync:
        n = engine.sync_branch(args.table, args.branch, on_conflict=args.on_conflict)
        print(f"synced branch {args.branch!r} of {args.table} with main: {n} change rows")
        return 0
    if args.drop:
        engine.drop_branch(args.table, args.branch)
        print(f"dropped branch {args.branch!r} of {args.table}")
        return 0
    phys = engine.create_branch(args.table, args.branch, from_version=args.from_version)
    print(f"created branch {args.branch!r} of {args.table} -> table {phys}")
    return 0


def cmd_optimize(args) -> int:
    """Table maintenance: --purge materializes the deletion-vector
    mask rewriting ONLY masked files (REORG APPLY (PURGE)); otherwise
    compact small files toward --target-files (which also
    materializes any mask). One table or, with no name, every table
    with data."""
    engine = _engine(args)
    from .node.node import Table

    names = [args.table] if args.table else list(engine.catalog.table_names())
    for name in names:
        with engine.node_context("__optimize__", outputs={"out": name}):
            t = Table("out", "w")
            if args.purge:
                n = t.purge_deletes()
                print(f"{name}: purged {n} masked row images" if n else f"{name}: no mask")
            else:
                v = t.compact(target_files=args.target_files)
                print(f"{name}: compacted -> {v.version_id}" if v else f"{name}: nothing to compact")
    return 0


def cmd_analyze(args) -> int:
    """ANALYZE: compute + store per-column statistics (non-null count,
    approx NDV, min/max) for one table or every table with data; view
    them via the __sys_column_stats system view or this command's
    output."""
    engine = _engine(args)
    names = [args.table] if args.table else list(engine.catalog.table_names())
    for name in names:
        with engine.node_context("__analyze__", inputs={"in": name}):
            from .node.node import Table

            st = Table("in", "r").analyze()
        if st is None:
            print(f"{name}: no data")
            continue
        print(f"{name}: {st['rows']} rows")
        for col, s in st["cols"].items():
            print(
                f"  {col}: nonnull={s['n_nonnull']} ndv~{s['ndv_approx']} "
                f"min={s['min']!r} max={s['max']!r}"
            )
    return 0


def cmd_export(args) -> int:
    """Export a table's active version to an external directory
    (parquet/csv/jsonl shards — the training-data handoff format)."""
    engine = _engine(args)
    with engine.node_context("__export__", inputs={"in": args.table}):
        from .node.node import Table

        n = Table("in", "r").export(args.path, format=args.format, single_file=args.single_file)
    print(f"exported {n} rows of {args.table} to {args.path}")
    return 0


def cmd_import(args) -> int:
    """Import external data as a (new version of a) table — the
    inverse of export; --link hardlinks parquet files (zero-copy
    attach)."""
    engine = _engine(args)
    n = engine.import_table(args.table, args.path, format=args.format, link=args.link)
    print(f"imported {n} rows into {args.table} from {args.path}")
    return 0


def cmd_mv(args) -> int:
    """Materialized views: create (dims/measures spec), refresh one or
    all, or list specs + applied cursors (node/matview.py)."""
    engine = _engine(args)
    if args.action == "create":
        if not (args.name and args.source and args.order_by and args.measures):
            print("create requires NAME --source --order-by --measures", file=sys.stderr)
            return 2
        measures = {}
        for item in args.measures.split(","):
            out, _, rest = item.partition("=")
            agg, _, expr = rest.partition(":")
            measures[out.strip()] = (agg.strip(), expr.strip() or "*")
        engine.create_materialized_view(
            args.name,
            source=args.source,
            order_by=args.order_by,
            dims=[d for d in (args.dims or "").split(",") if d],
            measures=measures,
            where=args.where,
        )
        print(f"created materialized view {args.name}")
        return 0
    if args.action == "refresh":
        if args.name:
            n = engine.materialized_view(args.name).refresh(full=args.full)
            print(f"{args.name}: {n} delta rows applied")
        else:
            for name, n in engine.refresh_materialized_views().items():
                print(f"{name}: {n} delta rows applied")
        return 0
    # list
    for name in engine.catalog.matview_names():
        spec = engine.catalog.get_matview_spec(name) or {}
        av = engine.catalog.get_active_version(name)
        cur = engine.catalog.get_matview_cursor(name, av)
        ms = ",".join(f"{k}={a}({e})" for k, (a, e) in (spec.get("measures") or {}).items())
        print(f"{name}: source={spec.get('source')} dims={','.join(spec.get('dims') or [])} measures={ms} cursor={cur}")
    return 0


def cmd_view(args) -> int:
    """SQL views: create (stores the {{ ref }} template, late-bound at
    query time), list, or drop (Engine.create_view)."""
    engine = _engine(args)
    if args.action == "create":
        if not (args.name and args.sql):
            print("create requires NAME SQL", file=sys.stderr)
            return 2
        engine.create_view(args.name, args.sql)
        print(f"created view {args.name}")
        return 0
    if args.action == "drop":
        if not args.name:
            print("drop requires NAME", file=sys.stderr)
            return 2
        engine.drop_view(args.name)
        print(f"dropped view {args.name}")
        return 0
    for name in engine.catalog.view_names():
        print(f"{name}: {engine.catalog.get_view(name)}")
    return 0


def cmd_alter(args) -> int:
    """Zero-copy ALTER TABLE: add/rename/drop a column — metadata-only
    (node/evolution.py column mapping; files are never rewritten)."""
    engine = _engine(args)
    with engine.node_context("__alter__", outputs={"out": args.table}):
        from .node.node import Table

        tb = Table("out", "w")
        if args.action == "add":
            if not (args.column and args.type):
                print("add requires COLUMN --type", file=sys.stderr)
                return 2
            tb.add_column(args.column, args.type, default=args.default)
        elif args.action == "rename":
            if not (args.column and args.to):
                print("rename requires COLUMN --to", file=sys.stderr)
                return 2
            tb.rename_column(args.column, args.to)
        else:
            tb.drop_column(args.column)
    print(f"altered {args.table}")
    return 0


def cmd_config(args) -> int:
    print(json.dumps({"warehouse": _warehouse(args)}))
    return 0


def cmd_catalog(args) -> int:
    """Metastore admin: show the active persistence backend, or migrate
    the warehouse between backends (json file <-> sqlite WAL db) in
    place. Metadata-only — no SparkSession is started."""
    from .catalog.catalog import Catalog

    cat = Catalog(_warehouse(args))
    if args.action == "backend":
        print(cat._backend.name)
    else:  # migrate
        if args.to not in ("json", "sqlite"):
            print("migrate requires a target backend: json|sqlite", file=sys.stderr)
            return 2
        before = cat._backend.name
        after = cat.migrate_backend(args.to)
        print(f"{before} -> {after}" + (" (no-op)" if before == after else ""))
    return 0


def cmd_component(args) -> int:
    """Versioned component registry (the local mapping of the
    reference's marketplace download, services/download.py:9-20):
    install copies a source dir into components/<org>_<name>_<ver>/ and
    refuses to clobber an existing version without --overwrite."""
    from .graph.components import (
        ComponentError,
        install_component,
        list_components,
        parse_uses,
        publish_component,
        resolve_component,
        resolve_latest,
        semver_key,
    )

    root = args.dir or os.getcwd()
    try:
        if args.action == "install":
            if not args.src:
                print("component install requires: <uses> <src_dir>", file=sys.stderr)
                return 2
            dst = install_component(root, args.uses, args.src, overwrite=args.overwrite)
            print(f"installed {args.uses} -> {dst}")
        elif args.action == "publish":
            # immutable publish: dir or packaged zip; never overwrites
            if not args.src:
                print("component publish requires: <uses> <src_dir|src.zip>", file=sys.stderr)
                return 2
            dst = publish_component(root, args.uses, args.src)
            print(f"published {args.uses} -> {dst}")
        elif args.action == "resolve":
            print(resolve_component(root, args.uses))
        else:  # list — semver-ordered per component, @latest marked
            refs = sorted(
                list_components(root),
                key=lambda r: (parse_uses(r)[0], parse_uses(r)[1], semver_key(parse_uses(r)[2])),
            )
            latest = {}
            for ref in refs:
                org, name, _ = parse_uses(ref)
                latest[(org, name)] = ref  # ascending: last wins
            for ref in refs:
                org, name, _ = parse_uses(ref)
                mark = "  (latest)" if latest[(org, name)] == ref else ""
                print(f"{ref}{mark}")
    except ComponentError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="patterns-spark",
        description=textwrap.dedent("Local Spark engine CLI with the patterns-devkit command surface."),
    )
    p.add_argument("--warehouse", help="warehouse dir (default $PATTERNS_WAREHOUSE or ~/.patterns-spark/warehouse)")
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("create", help="create an app or node")
    c.add_argument("what", choices=["app", "node"])
    c.add_argument("name")
    c.add_argument("--webhook", action="store_true")
    c.set_defaults(fn=cmd_create)

    u = sub.add_parser("upload", help="compile + register the graph")
    u.add_argument("path", nargs="?", default=None)
    u.set_defaults(fn=cmd_upload)

    tr = sub.add_parser("trigger", help="run one node")
    tr.add_argument("node")
    tr.add_argument("--downstream", action="store_true")
    tr.set_defaults(fn=cmd_trigger)

    r = sub.add_parser("run", help="run the whole graph to quiescence")
    r.add_argument("path", nargs="?", default=None)
    r.set_defaults(fn=cmd_run)

    ls = sub.add_parser("list", help="list catalog/graph objects")
    ls.add_argument("what", choices=["tables", "nodes", "webhooks", "secrets", "views", "matviews", "tags"])
    ls.add_argument("--json", action="store_true", help="output as JSON Lines")
    ls.set_defaults(fn=cmd_list)

    d = sub.add_parser("delete", help="delete a table")
    d.add_argument("table")
    d.set_defaults(fn=cmd_delete)

    dl = sub.add_parser("download", help="copy a registered app out of the warehouse")
    dl.add_argument("slug")
    dl.add_argument("dest", nargs="?", default=None)
    dl.add_argument("--force", action="store_true")
    dl.set_defaults(fn=cmd_download)

    df = sub.add_parser("diff", help="diff working dir vs registered copy")
    df.add_argument("path", nargs="?", default=None)
    df.set_defaults(fn=cmd_diff)

    sec = sub.add_parser("secret", help="store or read a named secret")
    sec.add_argument("action", choices=["set", "get"])
    sec.add_argument("name")
    sec.add_argument("values", nargs="*", help="key=value pairs (for set)")
    sec.set_defaults(fn=cmd_secret)

    v = sub.add_parser("vacuum", help="garbage-collect inactive table versions")
    v.add_argument("--orphans", action="store_true", help="also sweep unreferenced crash-leftover files")
    v.add_argument("--grace", type=float, default=3600.0, help="seconds a file must be old before orphan sweep (default 3600)")
    v.set_defaults(fn=cmd_vacuum)

    tg = sub.add_parser("tag", help="create/list/drop named GC-exempt version tags")
    tg.add_argument("table", help="table name")
    tg.add_argument("tag", nargs="?", help="tag name (omit to list tags)")
    tg.add_argument("--version", help="version id to pin (default: active)")
    tg.add_argument("--drop", action="store_true", help="remove the tag")
    tg.set_defaults(fn=cmd_tag)

    op = sub.add_parser("optimize", help="compact small files / purge deletion-vector masks")
    op.add_argument("table", nargs="?", help="table name (default: all tables)")
    op.add_argument("--target-files", type=int, default=None, help="compaction target file count")
    op.add_argument("--purge", action="store_true", help="materialize masks only (REORG APPLY (PURGE))")
    op.set_defaults(fn=cmd_optimize)

    br = sub.add_parser("branch", help="create/list/merge/drop table branches")
    br.add_argument("table", help="table name")
    br.add_argument("branch", nargs="?", help="branch name (omit to list branches)")
    br.add_argument("--merge", action="store_true", help="merge the branch back into the table")
    br.add_argument(
        "--sync",
        action="store_true",
        help="catch the branch up with main (apply main's changes since the fork, move the fork point)",
    )
    br.add_argument(
        "--on-conflict",
        choices=["error", "branch_wins", "main_wins"],
        default="error",
        help="three-way merge policy for keys changed on both sides",
    )
    br.add_argument("--drop", action="store_true", help="abandon the branch")
    br.add_argument("--from-version", help="fork point: version id, tag, or 'latest' (default: active)")
    br.set_defaults(fn=cmd_branch)

    an = sub.add_parser("analyze", help="compute + store per-column table statistics")
    an.add_argument("table", nargs="?", help="table name (default: all tables)")
    an.set_defaults(fn=cmd_analyze)

    ex = sub.add_parser("export", help="export a table to parquet/csv/jsonl shards")
    ex.add_argument("table")
    ex.add_argument("path")
    ex.add_argument("--format", default="parquet", choices=["parquet", "csv", "json", "jsonl"])
    ex.add_argument("--single-file", dest="single_file", action="store_true")
    ex.set_defaults(fn=cmd_export)

    im = sub.add_parser("import", help="import external data as a table (inverse of export)")
    im.add_argument("table")
    im.add_argument("path")
    im.add_argument("--format", default="parquet", choices=["parquet", "csv", "json", "jsonl"])
    im.add_argument("--link", action="store_true", help="hardlink parquet files (zero-copy attach)")
    im.set_defaults(fn=cmd_import)

    mv = sub.add_parser("mv", help="create/refresh/list incremental materialized views")
    mv.add_argument("action", choices=["create", "refresh", "list"])
    mv.add_argument("name", nargs="?", default=None, help="view name (refresh: default all)")
    mv.add_argument("--source", default=None, help="source table (create)")
    mv.add_argument("--order-by", dest="order_by", default=None, help="monotonic cursor column (create)")
    mv.add_argument("--dims", default=None, help="comma-separated dim columns (create)")
    mv.add_argument("--measures", default=None, help="out=agg:expr[,...] e.g. total=sum:amt,n=count:* (create)")
    mv.add_argument("--where", default=None, help="source filter (create)")
    mv.add_argument("--full", action="store_true", help="full recompute (refresh)")
    mv.set_defaults(fn=cmd_mv)

    vw = sub.add_parser("view", help="create/list/drop catalog SQL views")
    vw.add_argument("action", choices=["create", "list", "drop"])
    vw.add_argument("name", nargs="?", default=None)
    vw.add_argument("sql", nargs="?", default=None, help="view SQL with {{ refs }} (create)")
    vw.set_defaults(fn=cmd_view)

    al = sub.add_parser("alter", help="zero-copy ALTER TABLE (add/rename/drop column)")
    al.add_argument("action", choices=["add", "rename", "drop"])
    al.add_argument("table")
    al.add_argument("column")
    al.add_argument("--type", default=None, help="column type DDL (add)")
    al.add_argument("--default", default=None, help="SQL literal default (add)")
    al.add_argument("--to", default=None, help="new name (rename)")
    al.set_defaults(fn=cmd_alter)

    cfg = sub.add_parser("config", help="show configuration")
    cfg.set_defaults(fn=cmd_config)

    catp = sub.add_parser("catalog", help="metastore admin: show/migrate persistence backend")
    catp.add_argument("action", choices=["backend", "migrate"])
    catp.add_argument(
        "to", nargs="?", default=None,
        help="target backend (migrate): json|sqlite|objectstore",
    )
    catp.set_defaults(fn=cmd_catalog)

    comp = sub.add_parser("component", help="install/publish/resolve/list versioned components")
    comp.add_argument("action", choices=["install", "publish", "resolve", "list"])
    comp.add_argument("uses", nargs="?", default=None, help="org/name@version (or @latest for resolve)")
    comp.add_argument("src", nargs="?", default=None, help="source dir or zip (install/publish)")
    comp.add_argument("--dir", default=None, help="graph dir (default cwd)")
    comp.add_argument("--overwrite", action="store_true")
    comp.set_defaults(fn=cmd_component)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
