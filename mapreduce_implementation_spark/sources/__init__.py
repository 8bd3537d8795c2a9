from .tables import TABLES, load_table, load_tables, read_text_dir, read_int_lines

__all__ = ["TABLES", "load_table", "load_tables", "read_text_dir", "read_int_lines"]
