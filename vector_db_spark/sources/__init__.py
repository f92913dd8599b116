from vector_db_spark.sources.fixtures import TABLES, load_table, load_tables, register_views

__all__ = ["TABLES", "load_table", "load_tables", "register_views"]
