"""Pre-planning helpers that run before Catalyst sees the query."""

from dl_datalake_spark.plans.manifest_pruning import prune_files, read_pruned

__all__ = ["prune_files", "read_pruned"]
