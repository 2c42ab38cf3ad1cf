from fdi_flow_spark.sources.tables import TABLES, events_series, load_table, read_csv_series

__all__ = ["TABLES", "load_table", "events_series", "read_csv_series"]
