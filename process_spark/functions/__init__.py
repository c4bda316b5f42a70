"""Pure Column-expression libraries (SURVEY.md §2.3, §2.11, §2.12).

Everything here compiles to Catalyst expressions inside whole-stage
codegen — no Python UDFs on the hot path (SURVEY.md §3.2 design rule).
"""

from process_spark.functions import angles, geo, nmea, textfn, vectorfn  # noqa: F401
