"""Output sink dispatch tests (reference: internal/output/manager.go:50-79,
json.go:28-39 array form, csv.go:35-79 header+rows)."""

from __future__ import annotations

import json
import os

import pytest

from datascrapexter_spark.sources.sinks import to_json_array, write_output


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).coalesce(1)


def test_json_sink(spark, df, tmp_path):
    path = str(tmp_path / "out_json")
    write_output(df, "json", path)
    rows = []
    for f in os.listdir(path):
        if f.startswith("part-"):
            with open(os.path.join(path, f)) as fh:
                rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted(rows, key=lambda r: r["id"]) == [
        {"id": 1, "name": "a"}, {"id": 2, "name": "b"}]


def test_csv_sink_header(spark, df, tmp_path):
    path = str(tmp_path / "out_csv")
    write_output(df, "csv", path)
    lines = []
    for f in os.listdir(path):
        if f.startswith("part-"):
            lines += open(os.path.join(path, f)).read().splitlines()
    assert lines[0] == "id,name"
    assert sorted(lines[1:]) == ["1,a", "2,b"]


def test_parquet_sink_partition_by(spark, df, tmp_path):
    path = str(tmp_path / "out_pq")
    write_output(df, "parquet", path, partition_by=["name"],
                 compression="snappy")
    assert os.path.isdir(os.path.join(path, "name=a"))
    back = spark.read.parquet(path)
    assert back.count() == 2


def test_yaml_sink_driver_side(spark, df, tmp_path):
    path = str(tmp_path / "out.yaml")
    write_output(df, "yaml", path)
    text = open(path).read()
    assert "id" in text and "name" in text


def test_json_array_byte_parity(spark, df):
    # reference json.go writes a pretty array; canonical form here
    arr = json.loads(to_json_array(df))
    assert arr == [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]


def test_unknown_format_rejected(spark, df, tmp_path):
    with pytest.raises(ValueError):
        write_output(df, "excel", str(tmp_path / "x"))
    with pytest.raises(ValueError):
        write_output(df, "json", None)
