"""Input generation and IO (partitioned parquet warehouse + resume manifest)."""
