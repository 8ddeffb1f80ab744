"""End-to-end pipelines: the Thai flagship and the DuckDB-verifiable
simple-text pipelines used by the driver's correctness gate."""
