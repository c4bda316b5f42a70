"""Queries: scalars (to be filled; see SURVEY.md §2)."""
