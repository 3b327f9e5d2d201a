"""Relational / dataflow operators: fused profiling, rules, dedup, similarity."""
