"""Scalar/batch functions (the reference's EvalFunc layer, SURVEY.md §2.1)."""
