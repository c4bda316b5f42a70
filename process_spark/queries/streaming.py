"""Queries: streaming (to be filled; see SURVEY.md §2)."""
