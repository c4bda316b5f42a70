"""Composite DataFrame operators Spark lacks natively (SURVEY.md §4.2):
as-of join, interval join, resample/LOCF, sessionization, maneuver
detection, dedup families, similarity search.
"""

from process_spark.operators import dedup, relational, series, similarity  # noqa: F401
