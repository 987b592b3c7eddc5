"""Type-vote schema inference — behavioral port of
pkg/util/types.go:12-89 (duplicated in the reference at
destinations/clickhouse/insert.go:17-94).

Per column, count the JSON type of every observed value across the
batch, then vote with priority (types.go:65-84):

    string > undefined > float > int > bool > (all-null -> string)

Int detection in the reference is textual (``strconv.Atoi`` on the raw
token, types.go:45): ``1e3`` fails Atoi -> float; values overflowing
int64 fail Atoi -> float. Python's json parser preserves exactly the
int/float split of JSON grammar (digit-only tokens -> int), so we add
only the int64 range check.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping

_INT64_MIN = -(2**63)
_INT64_MAX = 2**63 - 1

#: vote priority, highest first (types.go:65-84)
_PRIORITY = ("string", "undefined", "float", "int", "bool")


def json_value_tag(value: Any) -> str:
    """Tag one parsed-JSON value with the reference's type lattice."""
    if value is None:
        return "null"
    if isinstance(value, bool):  # before int: bool is a Python int subclass
        return "bool"
    if isinstance(value, str):
        return "string"
    if isinstance(value, int):
        if _INT64_MIN <= value <= _INT64_MAX:
            return "int"
        return "float"  # Atoi overflow -> float (types.go:45-50)
    if isinstance(value, float):
        return "float"
    return "undefined"  # arrays/objects surviving flatten -> string column


def vote(counts: Mapping[str, int]) -> str:
    """Resolve one column's type from its tag counts."""
    for tag in _PRIORITY:
        if counts.get(tag, 0) > 0:
            # undefined (array/object leftovers) stores as string
            # (types.go:69-70)
            return "string" if tag == "undefined" else tag
    return "string"  # all-null (or empty) -> string (types.go:80-83)


def infer_types(rows: Iterable[Mapping[str, Any]]) -> dict[str, str]:
    """Column -> voted type tag over a batch of flat rows."""
    counts: dict[str, dict[str, int]] = {}
    for row in rows:
        for k, v in row.items():
            c = counts.setdefault(k, {})
            tag = json_value_tag(v)
            c[tag] = c.get(tag, 0) + 1
    return {k: vote(c) for k, c in counts.items()}
