from .readers import (
    TABLES,
    load_table,
    read_orders_json,
    read_retail_csv,
    read_sensor_stream,
    read_text_corpus,
)
from .sinks import write_csv, write_parquet

__all__ = [
    "TABLES",
    "load_table",
    "read_retail_csv",
    "read_orders_json",
    "read_sensor_stream",
    "read_text_corpus",
    "write_csv",
    "write_parquet",
]
