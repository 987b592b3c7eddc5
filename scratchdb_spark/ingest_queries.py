"""Ingest round-trip catalog queries: the reference's canonical
insert-then-query-back test (destinations/clickhouse/clickhouse_test.go:
15-103) expressed as driver-checkable queries, so the N1-N7 ingest
semantics (flatten, type vote, auto-create, schema evolution, row-id
stamping) get correctness rows instead of pytest-only coverage.

Each query builds a throwaway warehouse under a fresh temp dir, pushes a
FIXED JSON fixture through the real IngestPipeline (the same code the
HTTP insert endpoint calls), reads the table back, and projects a
deterministic view of the result:

- ``__row_id`` values are snowflake-stamped (wall-clock dependent), so
  queries assert their CONTRACT — presence, non-null, uniqueness —
  via ``has_row_id`` / rank columns rather than echoing raw ids;
- ``___document_id`` is a random UUID, so vertical-flatten queries
  project the per-document row count (the grouping the id exists to
  express) instead of the id itself.

Oracles are literal VALUES — the expected stored rows per FIXTURES.md
§2, independently derivable from the reference's flattener/type-vote
semantics (api/flattener.go, util/types.go, api/data.go:123-129).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .queries import register


def _roundtrip(
    spark: SparkSession, body, flatten: str = "horizontal"
) -> DataFrame:
    from .ingest.pipeline import IngestPipeline
    from .tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="ingest_rt_"))
    pipe = IngestPipeline(spark, wh)
    pipe.insert("db", "t", body, flatten=flatten)
    pipe.flush()
    return wh.read("db", "t")


@register(
    "ingest_roundtrip_flat",
    """
    SELECT * FROM (VALUES
      ('hi',  CAST(42 AS BIGINT), CAST(1.5  AS DOUBLE), true,
       CAST(NULL AS VARCHAR), true),
      ('bye', CAST(7  AS BIGINT), CAST(2.25 AS DOUBLE), false,
       CAST(NULL AS VARCHAR), true)
    ) AS t(s, i, f, b, n, has_row_id)
    """,
    doc="N3+N4+N6+N7 round-trip (FIXTURES.md F1/F2): array body = two "
        "rows; type vote maps string/int/float/bool; an all-null key "
        "defaults to STRING (util/types.go:80-83); every stored row got "
        "a snowflake __row_id (api/data.go:123-129).",
    bench=False,
)
def ingest_roundtrip_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(
        spark,
        [
            {"s": "hi", "i": 42, "f": 1.5, "b": True, "n": None},
            {"s": "bye", "i": 7, "f": 2.25, "b": False, "n": None},
        ],
    )
    return df.select(
        "s", "i", "f", "b", "n",
        F.col("__row_id").isNotNull().alias("has_row_id"),
    )


@register(
    "ingest_roundtrip_nested",
    """
    SELECT * FROM (VALUES
      ('alice', 'a', 'b', CAST(1 AS BIGINT), CAST(1 AS BIGINT))
    ) AS t(user_name, user_tags_0, user_tags_1, n, n_distinct_row_ids)
    """,
    doc="N1 horizontal flatten round-trip (FIXTURES.md F3, "
        "api/flattener.go:141-154): nested object keys underscore-join, "
        "array indices become column-name suffixes; one row per "
        "document.",
    bench=False,
)
def ingest_roundtrip_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(
        spark, {"user": {"name": "alice", "tags": ["a", "b"]}, "n": 1}
    )
    return df.groupBy(
        "user_name", "user_tags_0", "user_tags_1", "n"
    ).agg(F.countDistinct("__row_id").alias("n_distinct_row_ids"))


@register(
    "ingest_roundtrip_vertical",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'x', CAST(0 AS BIGINT), 'c',
       CAST(4 AS BIGINT)),
      (CAST(1 AS BIGINT), CAST(0 AS BIGINT), 'y', CAST(1 AS BIGINT), 'c',
       CAST(4 AS BIGINT)),
      (CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'x', CAST(0 AS BIGINT), 'c',
       CAST(4 AS BIGINT)),
      (CAST(2 AS BIGINT), CAST(1 AS BIGINT), 'y', CAST(1 AS BIGINT), 'c',
       CAST(4 AS BIGINT)),
      (CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
       CAST(NULL AS BIGINT), 'd', CAST(1 AS BIGINT))
    ) AS t(a, __order_a, b, __order_b, k, rows_in_doc)
    """,
    doc="N2 vertical flatten round-trip (FIXTURES.md F4, "
        "api/flattener.go:20-139): sibling arrays cross-product into 4 "
        "rows carrying __order_<path> element indices; an empty array "
        "yields one row with the column NULL (flattener.go:82-86); "
        "rows_in_doc counts rows sharing one ___document_id "
        "(flattener.go:118-127).",
    bench=False,
)
def ingest_roundtrip_vertical(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _roundtrip(
        spark,
        [{"a": [1, 2], "b": ["x", "y"], "k": "c"}, {"a": [], "k": "d"}],
        flatten="vertical",
    )
    w = Window.partitionBy("___document_id")
    return df.select(
        "a", "__order_a", "b", "__order_b", "k",
        F.count(F.lit(1)).over(w).alias("rows_in_doc"),
    )


@register(
    "ingest_roundtrip_evolution",
    """
    SELECT * FROM (VALUES
      (CAST(1 AS BIGINT),    'a',                   CAST(NULL AS BOOLEAN), 1),
      (CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), true,                  2)
    ) AS t(x, s, y, batch_rank)
    """,
    doc="N5 schema evolution round-trip (first-batch-wins, SURVEY.md "
        "§1.3): batch 1 fixes x BIGINT; batch 2's x=2.5 is not "
        "losslessly coercible so it stores NULL (documented "
        "cast-else-null divergence), its new column y evolves in, and "
        "batch 1 rows read y as NULL. batch_rank orders rows by "
        "snowflake __row_id, asserting ids are monotone across "
        "batches (N7).",
    bench=False,
)
def ingest_roundtrip_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .ingest.pipeline import IngestPipeline
    from .tables import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="ingest_rt_"))
    pipe = IngestPipeline(spark, wh)
    pipe.insert("db", "t", {"x": 1, "s": "a"})
    pipe.flush()
    pipe.insert("db", "t", {"x": 2.5, "y": True})
    pipe.flush()
    df = wh.read("db", "t")
    return df.select(
        "x", "s", "y",
        # partitionless rank is safe HERE only: the frame is the
        # 2-row demo table built by the literal inserts above, never
        # a data table (the data-sized form of this pattern is what
        # operators/prefix_sum.py exists to replace)
        F.row_number()
        .over(Window.orderBy("__row_id"))
        .alias("batch_rank"),
    )
