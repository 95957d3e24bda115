from crawler_spark.sources.formats import read_source, split_corrupt, write_sink
from crawler_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES", "load_table", "load_tables", "register_views",
    "read_source", "split_corrupt", "write_sink",
]
