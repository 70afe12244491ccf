"""Storage layer: graph-table IO + staged checkpoints with lineage.

All pipeline code targets :class:`.graph_table.GraphTable` /
:class:`.checkpoint.StageCheckpointer`, never a format directly — Iceberg
backend when a catalog is configured (production framing), partitioned
parquet + versioned snapshot manifests in this sandbox (SURVEY.md §8.3).
"""
