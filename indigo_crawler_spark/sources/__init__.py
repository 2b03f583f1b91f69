"""Sources/sinks: the TableIO seam (Iceberg-or-Parquet) and fixture loaders."""
