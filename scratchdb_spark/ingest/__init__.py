"""Ingest pipeline: the half of ScratchDB with bespoke semantics.

JSON body -> flatten (horizontal or vertical) -> __row_id stamp ->
NDJSON buffer (size/rows/age rotation) -> type-vote schema inference ->
table create/evolve -> aligned append. Reference trace: api/data.go:74-153
-> datasink/filesystem/filesystem.go -> workers/workers.go:64-116 ->
destinations/*/insert.go.
"""

from .flatten import flatten_horizontal, flatten_vertical, flatten_item
from .infer import infer_types, json_value_tag, vote
from .ids import SnowflakeGenerator
from .pipeline import IngestPipeline

__all__ = [
    "flatten_horizontal",
    "flatten_vertical",
    "flatten_item",
    "infer_types",
    "json_value_tag",
    "vote",
    "SnowflakeGenerator",
    "IngestPipeline",
]
