from etl_caic_spark.sources.tables import TABLE_NAMES, load_table, table_path

__all__ = ["TABLE_NAMES", "load_table", "table_path"]
