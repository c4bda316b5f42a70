"""Queries: windows (to be filled; see SURVEY.md §2)."""
