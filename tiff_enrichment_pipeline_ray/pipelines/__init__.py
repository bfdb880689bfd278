"""End-to-end pipelines: the flagship enrichment DAG + driver query suite."""
