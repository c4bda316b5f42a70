"""Queries: timeseries (to be filled; see SURVEY.md §2)."""
