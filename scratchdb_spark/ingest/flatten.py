"""JSON flatteners — behavioral port of the reference's two strategies
(api/flattener.go; NOT a code translation — reimplemented from observed
semantics in Python).

Horizontal (default, api/flattener.go:141-154, jeremywohl/flatten
UnderscoreStyle): one row per document; nested object keys join with
``_``; array elements become indexed keys (``x_0``, ``x_1``); empty
objects/arrays contribute nothing.

Vertical (``?flatten=vertical``, api/flattener.go:20-139): arrays
explode into rows, siblings cross-product, scalars broadcast to every
row; each exploded row carries ``__order_<path>`` (the element's index,
flattener.go:71-77); an empty array yields one row with the column NULL
(flattener.go:82-86); every row from one document shares a
``___document_id`` (ULID in the reference, flattener.go:118-127 — here
a UUID4 hex, same uniqueness contract).
"""

from __future__ import annotations

import json
import uuid
from typing import Any


# ---------------------------------------------------------------------------
# Horizontal
# ---------------------------------------------------------------------------

def _flatten_h(value: Any, path: str, out: dict[str, Any]) -> None:
    if isinstance(value, dict):
        for k, v in value.items():
            _flatten_h(v, f"{path}_{k}" if path else k, out)
    elif isinstance(value, list):
        for i, v in enumerate(value):
            _flatten_h(v, f"{path}_{i}" if path else str(i), out)
    else:
        out[path] = value


def flatten_horizontal(doc: dict[str, Any]) -> list[dict[str, Any]]:
    """One flat row per document; key paths underscore-joined."""
    out: dict[str, Any] = {}
    _flatten_h(doc, "", out)
    return [out]


# ---------------------------------------------------------------------------
# Vertical
# ---------------------------------------------------------------------------

def _path_str(path: tuple[str, ...]) -> str:
    return "_".join(path)


def _flatten_v(value: Any, path: tuple[str, ...]) -> list[dict[str, Any]]:
    if isinstance(value, list):
        if not value:
            return [{_path_str(path): None}]
        rows: list[dict[str, Any]] = []
        order_key = "__order_" + _path_str(path)
        for i, item in enumerate(value):
            for row in _flatten_v(item, path):
                row[order_key] = i
                rows.append(row)
        return rows
    if isinstance(value, dict):
        parts = [_flatten_v(v, path + (k,)) for k, v in value.items()]
        # cross-product across sibling keys, merging row dicts
        result: list[dict[str, Any]] = [{}]
        for part in parts:
            result = [
                {**lhs, **rhs} for lhs in result for rhs in part
            ]
        return result
    return [{_path_str(path): value}]


def flatten_vertical(
    doc: dict[str, Any], document_id: str | None = None
) -> list[dict[str, Any]]:
    """Explode arrays to rows (cross-product across siblings); stamp a
    shared ``___document_id`` and per-array ``__order_<path>`` columns."""
    doc = dict(doc)
    doc["___document_id"] = document_id or uuid.uuid4().hex
    return _flatten_v(doc, ())


def flatten_item(
    body_item: str | dict[str, Any], mode: str = "horizontal"
) -> list[dict[str, Any]]:
    """Flatten one JSON document (string or parsed) into 1..N flat rows."""
    doc = json.loads(body_item) if isinstance(body_item, str) else body_item
    if not isinstance(doc, dict):
        raise ValueError("each item must be a JSON object")
    if mode == "vertical":
        return flatten_vertical(doc)
    return flatten_horizontal(doc)
