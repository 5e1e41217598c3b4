from .report import print_report, write_csv, write_parquet

__all__ = ["print_report", "write_csv", "write_parquet"]
