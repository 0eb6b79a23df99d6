"""Pallas TPU kernels for the hot paths (SURVEY.md §7 stage 5)."""
