"""Queries: text (to be filled; see SURVEY.md §2)."""
