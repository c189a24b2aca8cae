"""Sink round-trips: what the writers produce, the readers load back
identically (schema + values) — the K1/K3 artifact contract."""

from __future__ import annotations

from hadoop_pyspark_streaming_analytics_spark.sources.readers import load_table
from hadoop_pyspark_streaming_analytics_spark.sources.sinks import write_csv, write_parquet


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "pq")
    write_parquet(src, out)
    back = spark.read.parquet(out)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_single_file_csv_roundtrip(spark, sf_dir, tmp_path):
    import glob

    src = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = str(tmp_path / "csv")
    write_csv(src, out, single_file=True)
    # the reference-parity artifact: exactly ONE data file
    assert len(glob.glob(f"{out}/part-*.csv")) == 1
    back = spark.read.option("header", True).schema(src.schema).csv(out)
    assert _rows(back) == _rows(src)
