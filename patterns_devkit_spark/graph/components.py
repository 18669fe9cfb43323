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


def install_component(graph_dir: str, uses: str, src_dir: str, overwrite: bool = False) -> str:
    """Install src_dir (must contain graph.yml) as the given versioned
    component. Refuses to overwrite an existing version unless
    overwrite=True. Returns the installed directory."""
    if not os.path.isfile(os.path.join(src_dir, "graph.yml")):
        raise ComponentError(f"{src_dir} is not a component (no graph.yml)")
    dst = component_dir(graph_dir, uses)
    if os.path.exists(dst):
        if not overwrite:
            raise ComponentError(
                f"component {uses} already installed at {dst}; versions are "
                "immutable — bump the version or pass overwrite=True"
            )
        shutil.rmtree(dst)
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    shutil.copytree(src_dir, dst)
    return dst


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


def resolve_component(graph_dir: str, uses: str) -> str:
    """Directory for a `uses:` ref; raises with the install hint when
    absent (the reference's download step has no remote counterpart)."""
    d = component_dir(graph_dir, uses)
    if not os.path.isfile(os.path.join(d, "graph.yml")):
        raise ComponentError(
            f"component {uses} is not installed; install it with "
            f"`cli component install {uses} <src_dir>`"
        )
    return d
