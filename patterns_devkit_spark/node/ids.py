"""Monotonic base32 id generation.

The reference's ``add_monotonic_id`` adds "a unique, strictly
monotonically increasing base32 string" per written record (reference:
patterns/node/node.py:275-276,286-294). Spark's
``monotonically_increasing_id()`` is neither dense nor monotonic across
runs, so ids derive from a per-table persisted high-watermark (held in
the catalog) plus a dense ``row_number()`` within the flushed batch;
the integer is Crockford-base32 encoded zero-padded to 13 chars so
lexicographic order equals numeric order (SURVEY.md §4, §7.3).

Node ids use the reference's 8-char [0-9a-z] alphabet
(reference: patterns/cli/helpers.py:128-132).
"""
from __future__ import annotations

import random
import string

_CROCKFORD = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
_ID_WIDTH = 13  # 32**13 > 2**64: enough for any 64-bit counter


def encode_base32(n: int, width: int = _ID_WIDTH) -> str:
    if n < 0:
        raise ValueError("monotonic ids are non-negative")
    out = []
    while n:
        out.append(_CROCKFORD[n & 31])
        n >>= 5
    s = "".join(reversed(out)) or "0"
    if len(s) > width:
        raise ValueError(f"id overflow: {s!r} wider than {width}")
    return s.rjust(width, "0")


def encode_base32_col(seq, width: int = _ID_WIDTH):
    """JVM-side Crockford base32 of a non-negative bigint column —
    identical strings to encode_base32 (property-tested), zero Python
    in the write hot path: conv() emits digits 0-9A-V, translate()
    remaps to the Crockford alphabet, lpad() zero-pads so lexical
    order == numeric order."""
    from pyspark.sql import functions as F

    return F.lpad(
        F.translate(F.conv(seq.cast("string"), 10, 32), "ABCDEFGHIJKLMNOPQRSTUV", _CROCKFORD[10:]),
        width,
        "0",
    )


def decode_base32(s: str) -> int:
    n = 0
    for ch in s.lstrip("0") or "0":
        n = (n << 5) | _CROCKFORD.index(ch)
    return n


def random_node_id(rng: random.Random | None = None) -> str:
    """8-char id, alphabet [0-9a-z], as the reference assigns to graph
    nodes (patterns/cli/helpers.py:128-132)."""
    r = rng or random
    alphabet = string.digits + string.ascii_lowercase
    return "".join(r.choice(alphabet) for _ in range(8))
