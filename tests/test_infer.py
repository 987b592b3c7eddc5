"""Type-vote lattice tests (FIXTURES.md F1/F5; pkg/util/types.go)."""

from __future__ import annotations

import json

from scratchdb_spark.ingest.infer import infer_types, json_value_tag, vote


def test_scalar_tags():
    assert json_value_tag("hi") == "string"
    assert json_value_tag(42) == "int"
    assert json_value_tag(1.5) == "float"
    assert json_value_tag(True) == "bool"
    assert json_value_tag(False) == "bool"
    assert json_value_tag(None) == "null"
    assert json_value_tag([1]) == "undefined"
    assert json_value_tag({"a": 1}) == "undefined"


def test_textual_int_detection():
    # types.go:45: strconv.Atoi on the raw token — 1e3 is a float
    assert json_value_tag(json.loads("1e3")) == "float"
    assert json_value_tag(json.loads("1.0")) == "float"
    assert json_value_tag(json.loads("100")) == "int"
    # int64 overflow -> Atoi fails -> float
    assert json_value_tag(2**63) == "float"
    assert json_value_tag(-(2**63)) == "int"


def test_vote_priority():
    # F5 cases
    assert infer_types([{"v": 1}, {"v": 2.5}, {"v": "x"}]) == {"v": "string"}
    assert infer_types([{"v": 1}, {"v": 2.5}]) == {"v": "float"}
    assert infer_types([{"v": True}, {"v": 1}]) == {"v": "int"}
    assert infer_types([{"v": True}, {"v": False}]) == {"v": "bool"}
    assert infer_types([{"v": None}]) == {"v": "string"}  # all-null -> string
    assert infer_types([{"v": None}, {"v": 3}]) == {"v": "int"}
    assert infer_types([{"v": [1]}, {"v": 3}]) == {"v": "string"}  # undefined wins


def test_vote_full_f1():
    rows = [{"s": "hi", "i": 42, "f": 1.5, "b": True, "n": None}]
    assert infer_types(rows) == {
        "s": "string", "i": "int", "f": "float", "b": "bool", "n": "string",
    }


def test_vote_empty():
    assert vote({}) == "string"
