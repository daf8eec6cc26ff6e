from .csv import read_csv, write_csv
from .jsonl import read_jsonl, write_jsonl
from .tables import TABLE_NAMES, load_table, register_views

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "register_views",
    "read_jsonl",
    "write_jsonl",
    "read_csv",
    "write_csv",
]
