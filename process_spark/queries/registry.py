"""Query registry backing __spark_entry__.queries() / oracle_sql().

Contract (driver, __spark_entry__.py:22-37):
- ``queries()[name](spark, sf_dir) -> DataFrame``
- ``oracle_sql()[name]`` = equivalent DuckDB SQL over pre-registered
  views, or absent for non-SQL-expressible ops (rows-only check).
- Column names AND value representation must match the oracle: alias
  every computed column identically on both sides, and round floating
  aggregates identically on both sides (SURVEY.md §5.2, §7.3 — hash
  matching on doubles is the biggest silent-failure risk).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

#: The driver grades the FIRST 50 registry entries (one CORRECTNESS row
#: each, measured across rounds). This list pins those 50 positions so
#: they span every SURVEY.md §2 operator family with oracle-backed
#: queries — multi-operator suites (queries/suites.py) where operators
#: share a table/grain, per-operator queries elsewhere. Everything not
#: listed keeps registration order below the window (still runnable,
#: still covered by the local pytest/oracle sweep).
GRADED_WINDOW: tuple[str, ...] = (
    # scans / filter / cleaning / IO
    "q1_pricing_summary",            # O2 O12 O22 O38 O56
    "clean_clamp_outliers",          # O13
    "io_roundtrip_suite",            # O3 O4 O5 O6
    # NMEA reference surface
    "nmea_parse_constructed",        # O1 O9 O10 O11
    "nmea_time_coord_suite",         # O14 O21
    "nmea_scalar_suite",             # O15 O16 O17 O18 O19 O20
    "maneuver_detect_metrics",       # O54 O55
    # joins
    "join_fact_dims_chain",          # O29 O30
    "join_outer_suite",              # O31 (left + full + right)
    "join_semi_anti_suite",          # O32 O33
    "join_interval_events_windows",  # O34
    "join_asof_purchase_before_click",  # O35
    "join_cross_blocked",            # O36
    # aggregation
    "agg_grouping_sets",             # O40 O102
    "agg_stats_suite",               # O41 O42
    "agg_argmax_conditional",        # O39 O43 O45
    "agg_collect_sorted_list",       # O44
    "agg_histogram_having",          # O46 O47
    # windows
    "win_orders_suite",              # O48 O50
    "win_events_suite",              # O37 O49 O51 O52 O53
    # UDF / Arrow surface
    "udf_python_udtf_suite",         # O96 O101
    "udf_pandas_suite",              # O97 O98
    "udf_arrow_suite",               # O99 O100
    # sort / top-k
    "sort_topk_suite",               # O57 O58
    # ids & deterministic sampling
    "sample_hash_deterministic",     # O87
    # set ops & dedup
    "setop_suite",                   # O59 O60 O61
    "dedup_keep_latest",             # O62
    "text_jaccard_pairs_blocked",    # O63 (exact oracle anchor for LSH)
    # vectors / multimodal
    "vec_norm_dup_suite",            # O64 O65
    "vec_knn_bruteforce",            # O66 O67
    "vec_ann_srp_bucketed",          # O68
    "vec_centroids",                 # O69
    "mm_blob_metadata_stats",        # O70
    # text & strings
    "string_regex_suite",            # O71 O72
    "text_term_frequency",           # O73 O74 O82
    "text_ngram_shingles",           # O75
    "text_lang_source_stats",        # O76
    "text_levenshtein",              # O77
    "text_lexicon_score",            # O78
    # JSON / map / array / hash / math scalars
    "json_map_suite",                # O79 O80 O81 O86
    "array_hofs",                    # O83 O84
    "math_fns",                      # O85
    # time series
    "ts_pivot_wide",                 # O23
    "ts_resample_grid",              # O24
    "ts_locf_suite",                 # O25 O26 O27
    "ts_ewma_fold",                  # O28
    # streaming (batch-twin / final-state oracles)
    "stream_windows_suite",          # O7 O8 O88 O89
    "stream_session_window",         # O90
    "stream_user_state_suite",       # O91 O92 O93 O94
    "stream_foreach_batch_export",   # O95
)


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and its DuckDB oracle) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _ordered_names() -> list[str]:
    """Graded window first (in pinned order), then the rest in
    registration order."""
    window = [n for n in GRADED_WINDOW if n in REGISTRY]
    rest = [n for n in REGISTRY if n not in GRADED_WINDOW]
    return window + rest


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
