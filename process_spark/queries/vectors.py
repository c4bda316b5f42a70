"""Queries: vectors (to be filled; see SURVEY.md §2)."""
