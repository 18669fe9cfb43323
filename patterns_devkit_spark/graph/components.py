"""Component registry: versioned install/resolve for `uses:` refs.

The reference resolves `uses: org/component@v1` by downloading a
versioned zip from its marketplace (reference services/download.py:9-20)
and refuses to clobber local edits (directory-editor overwrite
protection, tests/configuration/test_directory_editor.py). The local
engine maps that to a filesystem registry under the graph dir:

    components/<org>_<name>_<version>/graph.yml

install_component is the local analogue of download-and-unpack: copy a
component's source directory into the registry slot, refusing to
overwrite an existing version unless told to (versions are immutable by
default — re-publishing a changed v1 is exactly the mistake the
reference guards against).
"""
from __future__ import annotations

import os
import re
import shutil

_USES = re.compile(r"^(?P<org>[\w.-]+)/(?P<name>[\w.-]+)@(?P<version>[\w.-]+)$")


class ComponentError(Exception):
    pass


def parse_uses(uses: str) -> tuple[str, str, str]:
    m = _USES.match(uses or "")
    if not m:
        raise ComponentError(
            f"invalid component ref {uses!r}: expected org/name@version"
        )
    return m.group("org"), m.group("name"), m.group("version")


def component_dir(graph_dir: str, uses: str) -> str:
    org, name, version = parse_uses(uses)
    return os.path.join(graph_dir, "components", f"{org}_{name}_{version}")


def install_component(graph_dir: str, uses: str, src: str, overwrite: bool = False) -> str:
    """Install a source directory OR a packaged zip (graph/archive.py
    manifest) as the given versioned component. Refuses to overwrite
    an existing version unless overwrite=True. Returns the installed
    directory."""
    is_zip = os.path.isfile(src) and src.endswith(".zip")
    if not is_zip and not os.path.isfile(os.path.join(src, "graph.yml")):
        raise ComponentError(f"{src} is not a component (no graph.yml)")
    dst = component_dir(graph_dir, uses)
    if os.path.exists(dst):
        if not overwrite:
            raise ComponentError(
                f"component {uses} already installed at {dst}; versions are "
                "immutable — bump the version or pass overwrite=True"
            )
        shutil.rmtree(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    if is_zip:
        os.makedirs(dst)
        from .archive import GraphDirectoryEditor

        GraphDirectoryEditor(dst, overwrite=True).add_node_from_zip(
            "graph.yml", "graph.yml", open(src, "rb")
        )
        if not os.path.isfile(os.path.join(dst, "graph.yml")):
            shutil.rmtree(dst)
            raise ComponentError(f"{src} is not a component archive (no graph.yml)")
    else:
        shutil.copytree(src, dst)
    return dst


def publish_component(graph_dir: str, uses: str, src: str) -> str:
    """Publish = immutable install: a version, once published, can
    NEVER be replaced (the reference marketplace contract,
    services/download.py:9-20 — downloads are version-pinned, so a
    changed re-publish of v1 would silently fork consumers)."""
    return install_component(graph_dir, uses, src, overwrite=False)


def list_components(graph_dir: str) -> list[str]:
    """Installed refs as org/name@version strings."""
    root = os.path.join(graph_dir, "components")
    if not os.path.isdir(root):
        return []
    out = []
    for entry in sorted(os.listdir(root)):
        if os.path.isfile(os.path.join(root, entry, "graph.yml")):
            parts = entry.split("_")
            if len(parts) >= 3:
                out.append(f"{parts[0]}/{'_'.join(parts[1:-1])}@{parts[-1]}")
    return out


def semver_key(version: str) -> tuple:
    """Sortable key for loose semver strings ('v1', '2.10.3',
    '1.2.0-rc1'): numeric segments compare numerically, a pre-release
    suffix sorts BEFORE its release, and versions with more numeric
    depth compare as expected (1.2 < 1.2.1 < 1.10)."""
    core, dash, pre = version.lstrip("vV").partition("-")
    nums = []
    for part in core.split("."):
        m = re.match(r"(\d+)", part)
        nums.append(int(m.group(1)) if m else 0)
    while len(nums) < 3:
        nums.append(0)
    return (tuple(nums), 0 if dash else 1, pre)


def resolve_latest(graph_dir: str, org: str, name: str) -> str:
    """Highest installed version of org/name by semver ordering
    (`@latest` resolver)."""
    versions = []
    for ref in list_components(graph_dir):
        o, n, v = parse_uses(ref)
        if o == org and n == name:
            versions.append(v)
    if not versions:
        raise ComponentError(f"no installed versions of {org}/{name}")
    return max(versions, key=semver_key)


def resolve_component(graph_dir: str, uses: str) -> str:
    """Directory for a `uses:` ref; `@latest` resolves to the highest
    installed semver; raises with the install hint when absent (the
    reference's download step has no remote counterpart)."""
    org, name, version = parse_uses(uses)
    if version == "latest":
        uses = f"{org}/{name}@{resolve_latest(graph_dir, org, name)}"
    d = component_dir(graph_dir, uses)
    if not os.path.isfile(os.path.join(d, "graph.yml")):
        raise ComponentError(
            f"component {uses} is not installed; install it with "
            f"`cli component install {uses} <src_dir>`"
        )
    return d
