"""CMF estimators (SURVEY.md §2 component 2)."""
from .cmf import CMF

__all__ = ["CMF"]
