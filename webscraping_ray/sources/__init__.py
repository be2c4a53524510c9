"""Sources: deterministic synthetic page corpora and the partitioned
corpus store ("the web" as hash-bucketed Parquet)."""
