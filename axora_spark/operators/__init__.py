"""Dataflow operators (SURVEY.md §2)."""
