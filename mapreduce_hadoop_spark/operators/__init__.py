"""Operator library — each module mirrors a SURVEY.md §2 operator group."""
