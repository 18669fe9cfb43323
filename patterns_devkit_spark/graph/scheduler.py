"""Cron triggers (reference: per-node `trigger: "1 * * * *"` entries,
tests/configuration/test_config_editor.py:104). Minimal 5-field cron
matcher (no external deps): minute hour dom month dow, supporting
'*', '*/n', 'a-b', 'a,b,c' and combinations.
"""
from __future__ import annotations

import datetime as dt


def _field_matches(spec: str, value: int, lo: int, hi: int) -> bool:
    for part in spec.split(","):
        part = part.strip()
        if part == "*":
            return True
        if part.startswith("*/"):
            if (value - lo) % int(part[2:]) == 0:
                return True
        elif "-" in part:
            a, b = part.split("-", 1)
            step = 1
            if "/" in b:
                b, s = b.split("/", 1)
                step = int(s)
            if int(a) <= value <= int(b) and (value - int(a)) % step == 0:
                return True
        elif part.isdigit():
            if int(part) == value:
                return True
    return False


def cron_matches(expr: str, when: dt.datetime) -> bool:
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"invalid cron expression {expr!r} (need 5 fields)")
    minute, hour, dom, month, dow = fields
    return (
        _field_matches(minute, when.minute, 0, 59)
        and _field_matches(hour, when.hour, 0, 23)
        and _field_matches(dom, when.day, 1, 31)
        and _field_matches(month, when.month, 1, 12)
        and _field_matches(dow, when.isoweekday() % 7, 0, 6)  # 0=Sunday
    )


class Scheduler:
    """Drives cron-triggered node runs. Call run_pending once per
    minute tick (or pass explicit timestamps in tests)."""

    def __init__(self, runner):
        self.runner = runner
        self._last_tick: dt.datetime | None = None

    def due_nodes(self, when: dt.datetime) -> list[str]:
        return [
            n.id
            for n in self.runner.nodes
            if n.trigger and cron_matches(n.trigger, when) and n.kind in ("python", "sql")
        ]

    def run_pending(self, when: dt.datetime | None = None) -> list[str]:
        when = when or dt.datetime.now()
        when = when.replace(second=0, microsecond=0)
        if self._last_tick == when:
            return []
        self._last_tick = when
        ran = []
        for node_id in self.due_nodes(when):
            self.runner.run_node(node_id)
            ran.append(node_id)
        return ran
