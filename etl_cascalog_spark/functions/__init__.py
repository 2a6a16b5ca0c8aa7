"""Scalar function library (SURVEY.md §2.8, X1-X8).

Everything here is a Column expression built from ``pyspark.sql.functions`` —
JVM-side, inside whole-stage codegen. No Python UDFs in this module: the
reference's ``defmapfn`` lambdas all map onto built-ins.
"""

from etl_cascalog_spark.functions.dates import (
    future_dt,
    last_day_of_month,
    month_spine,
    prev_last_day,
    prev_last_month,
    prev_same_month,
    tomorrow_dt,
)
from etl_cascalog_spark.functions.conditionals import (
    c_gt,
    cif,
    compare_mark,
    convert_null,
    cor,
    mark,
    null_safe_delta,
    nvl2,
    or_tuple,
    str_least,
)
from etl_cascalog_spark.functions.maps import kv_lookup, pad_array, vars_to_kv

__all__ = [
    "future_dt",
    "last_day_of_month",
    "month_spine",
    "prev_last_day",
    "prev_last_month",
    "prev_same_month",
    "tomorrow_dt",
    "c_gt",
    "cif",
    "compare_mark",
    "convert_null",
    "cor",
    "mark",
    "null_safe_delta",
    "nvl2",
    "or_tuple",
    "str_least",
    "kv_lookup",
    "pad_array",
    "vars_to_kv",
]
