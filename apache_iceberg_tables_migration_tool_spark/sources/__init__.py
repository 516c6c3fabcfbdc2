"""Data sources: fixture parquet loader + the Parquet snapshot catalog."""
