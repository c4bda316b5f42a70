"""Queries: nmea (to be filled; see SURVEY.md §2)."""
