"""Input synthesis and parquet readers."""
