"""End-to-end pipelines and the operator registry."""
