"""Fused plan builders: multi-metric single-scan aggregation plans and their
ANSI-SQL (DuckDB) oracle twins."""
