"""Streaming / incremental-maintenance workloads — filled in as the
operators land."""

QUERIES: dict = {}
ORACLES: dict = {}
