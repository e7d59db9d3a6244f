"""Sources & sinks: typed CSV/JSON/parquet IO (reference §2.1)."""
