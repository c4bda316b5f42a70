"""Queries: setops (to be filled; see SURVEY.md §2)."""
