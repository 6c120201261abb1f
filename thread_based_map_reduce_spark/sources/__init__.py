from .registry import TABLE_NAMES, load_table, load_tables, read_source

__all__ = ["TABLE_NAMES", "load_table", "load_tables", "read_source"]
