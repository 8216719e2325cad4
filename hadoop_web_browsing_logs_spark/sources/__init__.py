from .readers import TABLE_NAMES, load_table, load_tables, read_corpus_dir, register_views
from .writers import write_parquet, write_reference_text

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "read_corpus_dir",
    "register_views",
    "write_parquet",
    "write_reference_text",
]
