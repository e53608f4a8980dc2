"""Training-data-pipeline workloads (dedup, similarity, text analysis,
multimodal) — filled in as the operators land."""

QUERIES: dict = {}
ORACLES: dict = {}
