"""Golden tests for the flatteners (FIXTURES.md §2 / api/flattener.go)."""

from __future__ import annotations

from scratchdb_spark.ingest.flatten import (
    flatten_horizontal,
    flatten_item,
    flatten_vertical,
)


def test_horizontal_nested_and_arrays():
    # F3: {"user":{"name":"alice","tags":["a","b"]},"n":1}
    rows = flatten_horizontal(
        {"user": {"name": "alice", "tags": ["a", "b"]}, "n": 1}
    )
    assert rows == [
        {"user_name": "alice", "user_tags_0": "a", "user_tags_1": "b", "n": 1}
    ]


def test_horizontal_scalars_passthrough():
    rows = flatten_horizontal({"s": "hi", "i": 42, "f": 1.5, "b": True, "n": None})
    assert rows == [{"s": "hi", "i": 42, "f": 1.5, "b": True, "n": None}]


def test_horizontal_empty_containers_dropped():
    # jeremywohl/flatten: empty maps/arrays contribute no keys
    assert flatten_horizontal({"a": {}, "b": [], "c": 1}) == [{"c": 1}]


def test_horizontal_deep_nesting():
    assert flatten_horizontal({"a": {"b": {"c": [{"d": 1}]}}}) == [
        {"a_b_c_0_d": 1}
    ]


def test_vertical_cross_product():
    # F4: sibling arrays cross-product -> 4 rows, shared ___document_id
    rows = flatten_vertical({"a": [1, 2], "b": ["x", "y"], "k": "c"}, "DOC1")
    assert len(rows) == 4
    combos = {(r["a"], r["b"]) for r in rows}
    assert combos == {(1, "x"), (1, "y"), (2, "x"), (2, "y")}
    for r in rows:
        assert r["k"] == "c"
        assert r["___document_id"] == "DOC1"
        assert r["__order_a"] in (0, 1) and r["__order_b"] in (0, 1)
    # order columns track the element index
    for r in rows:
        assert r["__order_a"] == [1, 2].index(r["a"])
        assert r["__order_b"] == ["x", "y"].index(r["b"])


def test_vertical_empty_array_null_row():
    # flattener.go:82-86: empty array -> one row, column NULL, no order col
    rows = flatten_vertical({"a": [], "k": 1}, "D")
    assert len(rows) == 1
    assert rows[0]["a"] is None
    assert rows[0]["k"] == 1
    assert "__order_a" not in rows[0]


def test_vertical_nested_objects_in_arrays():
    rows = flatten_vertical(
        {"items": [{"sku": "s1", "qty": 1}, {"sku": "s2", "qty": 2}]}, "D"
    )
    assert len(rows) == 2
    assert {(r["items_sku"], r["items_qty"], r["__order_items"]) for r in rows} == {
        ("s1", 1, 0),
        ("s2", 2, 1),
    }


def test_vertical_nested_array_path_names():
    rows = flatten_vertical({"a": {"b": [10, 20]}}, "D")
    assert {(r["a_b"], r["__order_a_b"]) for r in rows} == {(10, 0), (20, 1)}


def test_vertical_scalar_broadcast_no_arrays():
    rows = flatten_vertical({"x": 1, "y": "z"}, "D")
    assert rows == [{"x": 1, "y": "z", "___document_id": "D"}]


def test_flatten_item_modes():
    assert flatten_item('{"a":{"b":1}}') == [{"a_b": 1}]
    v = flatten_item('{"a":[1,2]}', "vertical")
    assert len(v) == 2 and all("___document_id" in r for r in v)
