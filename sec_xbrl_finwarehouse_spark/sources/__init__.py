from .tables import load_star_tables, register_star_views, table_path

__all__ = ["load_star_tables", "register_star_views", "table_path"]
