from __future__ import annotations

import json
import os

from scratchdb_spark import sources


def test_read_ndjson_roundtrip(spark, tmp_path):
    p = str(tmp_path / "d.ndjson")
    with open(p, "w") as f:
        for i in range(5):
            f.write(json.dumps({"i": i, "s": f"row{i}"}) + "\n")
    df = sources.read_ndjson(spark, p)
    assert df.count() == 5
    assert {r["s"] for r in df.collect()} == {f"row{i}" for i in range(5)}


def test_read_csv_header_and_schema(spark, tmp_path):
    p = str(tmp_path / "d.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = sources.read_csv(spark, p)
    assert df.columns == ["a", "b"]
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_write_result_formats(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "n")
    for fmt in ("parquet", "json", "csv"):
        out = str(tmp_path / fmt)
        sources.write_result(df, out, fmt=fmt, single_file=True)
        files = [f for f in os.listdir(out) if not f.startswith(("_", "."))]
        assert len(files) == 1, fmt
    back = sources.read_parquet(spark, str(tmp_path / "parquet"))
    assert sorted(r["n"] for r in back.collect()) == list(range(10))
