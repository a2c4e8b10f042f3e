from network_iq_spark.sources.jsonl import (
    jsonl_to_parquet,
    read_jsonl,
    read_jsonl_split,
    write_jsonl,
)
from network_iq_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "jsonl_to_parquet",
    "load_table",
    "load_tables",
    "read_jsonl",
    "read_jsonl_split",
    "write_jsonl",
]
