"""Sources: parquet readers, reference text-format reader, fixtures."""
