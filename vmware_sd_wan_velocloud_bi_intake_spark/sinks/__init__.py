from .upsert import insert_ignore_parquet, upsert_parquet, write_csv_report

__all__ = ["insert_ignore_parquet", "upsert_parquet", "write_csv_report"]
