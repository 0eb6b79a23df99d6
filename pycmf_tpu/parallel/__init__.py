"""Sharding layer: 1-D mesh row-sharded CMF (SURVEY.md §7 stage 6)."""
