"""Deterministic NMEA day-log fixture (FIXTURES.md §B1).

A simulated sail generated entirely from ``spark.range`` with integer
expression math — no RNG, no Python loop, no driver-side data — so the
same call is byte-identical on every run and scales to any length (the
generator itself is a distributed plan).

Shape of the simulated day (defaults):
- 2 hours at 1 Hz, with a 15-minute shore break in the middle → the
  pipeline should find exactly TWO sessions (races).
- Heading alternates 45° ↔ 135° every ``tack_period`` seconds, turning
  6°/s for 15 s → each alternation is one detectable tack (O54).
- Four sentences per second (RMC, VHW, MWV, HDG), each with a valid
  NMEA checksum; every ``corrupt_every``-th second the MWV checksum is
  corrupted for O10/O13 negative paths.
- Every line carries the logger's capture timestamp prefix
  (``2024-06-01T10:00:00Z $IIVHW,...``) — the reference's logger did
  the same [SURVEY.md D1, PK-high].
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from process_spark.functions.nmea import computed_checksum

START_TS = "2024-06-01 10:00:00"


def _fmt1(tenths: Column) -> Column:
    """Integer tenths → fixed one-decimal string ('62' → '6.2')."""
    return F.concat(
        (tenths / 10).cast("int").cast("string"),
        F.lit("."),
        F.pmod(tenths, F.lit(10)).cast("int").cast("string"),
    )


def _sentence(body: Column, corrupt: Column | None = None) -> Column:
    """``body`` (no ``$``/``*``) → full sentence with XOR checksum;
    optionally xor-corrupts the stated checksum where ``corrupt``."""
    chk = computed_checksum(F.concat(F.lit("$"), body))
    if corrupt is not None:
        chk = F.when(corrupt, chk.bitwiseXOR(F.lit(1))).otherwise(chk)
    return F.concat(
        F.lit("$"), body, F.lit("*"), F.lpad(F.upper(F.hex(chk)), 2, "0")
    )


def sail_log(
    spark: SparkSession,
    n_seconds: int = 7200,
    gap_start: int = 3600,
    gap_len: int = 900,
    tack_period: int = 600,
    turn_seconds: int = 15,
    corrupt_every: int = 97,
) -> DataFrame:
    """Generate the raw day log: ``DataFrame[raw: string]``, four
    sentences per active second, capture-timestamp-prefixed."""
    base = (
        spark.range(n_seconds)
        .withColumnRenamed("id", "s")
        .filter(
            ~F.col("s").between(gap_start, gap_start + gap_len - 1)
        )
    )
    s = F.col("s")
    ts = F.expr(f"timestamp'{START_TS}' + make_interval(0,0,0,0,0,0,s)")

    # Heading: alternate 45/135 with a linear 6°/s turn at period start.
    phase = (s / tack_period).cast("long") % 2
    target = F.when(phase == 0, F.lit(45)).otherwise(F.lit(135))
    prev = F.when(phase == 0, F.lit(135)).otherwise(F.lit(45))
    off = s % tack_period
    step = F.when(target > prev, F.lit(6)).otherwise(F.lit(-6))
    in_turn = (off < turn_seconds) & (s >= tack_period)
    hdg = F.when(in_turn, prev + step * off).otherwise(target).cast("int")
    hdg_mag = F.pmod(hdg - 16, F.lit(360)).cast("int")

    spd10 = (F.lit(60) + s % 10).cast("int")       # 6.0..6.9 kn
    aws10 = (F.lit(120) + s % 7).cast("int")       # 12.0..12.6 kn
    awa = (F.lit(35) + s % 5).cast("int")          # 35..39°

    lat = F.concat(F.lit("4738."), F.lpad(((s * 3) % 10000).cast("string"), 4, "0"))
    lon = F.concat(F.lit("12221."), F.lpad(((s * 7) % 10000).cast("string"), 4, "0"))
    hhmmss = F.date_format(ts, "HHmmss")
    ddmmyy = F.date_format(ts, "ddMMyy")
    prefix = F.concat(F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"), F.lit(" "))

    istr = lambda c: c.cast("string")  # noqa: E731

    rmc = _sentence(
        F.concat_ws(
            ",",
            F.lit("GPRMC"), hhmmss, F.lit("A"), lat, F.lit("N"), lon, F.lit("W"),
            _fmt1(spd10), istr(hdg), ddmmyy, F.lit("16.0"), F.lit("E"), F.lit("A"),
        )
    )
    vhw = _sentence(
        F.concat_ws(
            ",",
            F.lit("IIVHW"), istr(hdg), F.lit("T"), istr(hdg_mag), F.lit("M"),
            _fmt1(spd10), F.lit("N"), F.lit(""), F.lit("K"),
        )
    )
    mwv = _sentence(
        F.concat_ws(
            ",",
            F.lit("IIMWV"), istr(awa), F.lit("R"), _fmt1(aws10), F.lit("N"),
            F.lit("A"),
        ),
        corrupt=(s % corrupt_every == 0),
    )
    hdg_s = _sentence(
        F.concat_ws(
            ",",
            F.lit("IIHDG"), istr(hdg_mag), F.lit(""), F.lit(""), F.lit("16.0"),
            F.lit("E"),
        )
    )

    out = None
    for sent in (rmc, vhw, mwv, hdg_s):
        part = base.select(F.concat(prefix, sent).alias("raw"))
        out = part if out is None else out.unionAll(part)
    return out
