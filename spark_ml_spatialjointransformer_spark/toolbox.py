"""String micro-parsers for the transformer's CSV-style string params.

Behavioral parity with the reference's StringToolbox
(reference: src/main/scala/me/valik/toolbox/StringToolbox.scala:44-85):
split-and-trim dropping empties, positional number extraction, and the
``"name as alias"`` data-column parser
(reference: BroadcastSpatialJoin.scala:223-231).
"""

from __future__ import annotations

import re


def split_trim(src: str, sep: str = ",") -> list[str]:
    """Split ``src`` by ``sep`` (with surrounding whitespace), trim items,
    drop empties.  Parity: StringToolbox.scala:61-62."""
    if src is None:
        return []
    parts = re.split(r"\s*" + re.escape(sep) + r"\s*", src.strip())
    return [p for p in (x.strip() for x in parts) if p]


def extract_number(src: str, pos: int, sep: str = " ") -> float | None:
    """Split by ``sep``, take item at ``pos``, parse as float; None on any
    failure.  Parity: StringToolbox.scala:52-54."""
    try:
        return float(split_trim(src, sep)[pos])
    except (IndexError, ValueError, AttributeError):
        return None


def parse_data_columns(spec: str) -> list[tuple[str, str]]:
    """Parse ``"id as poi_id, name"`` into ``[("id","poi_id"), ("name","name")]``.

    The ``as`` separator is matched as a whitespace-delimited token, same as
    the reference's ``splitTrim("as")`` (BroadcastSpatialJoin.scala:227-228).
    """
    out: list[tuple[str, str]] = []
    for item in split_trim(spec, ","):
        parts = re.split(r"\s+as\s+", item)
        parts = [p for p in (x.strip() for x in parts) if p]
        if not parts:
            continue
        name = parts[0]
        alias = parts[1] if len(parts) > 1 else name
        out.append((name, alias))
    return out


def parse_map(src: str, sep: str = ",", kvsep: str = ":") -> dict[str, str]:
    """Parse ``"foo: bar, poo: bazz"`` into a dict.
    Parity: StringToolbox.scala:76-83 (pairs with != 2 parts are dropped)."""
    out: dict[str, str] = {}
    for item in split_trim(src, sep):
        kv = split_trim(item, kvsep)
        if len(kv) == 2:
            out[kv[0]] = kv[1]
    return out
