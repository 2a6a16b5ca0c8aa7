"""etl_cascalog_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark (DataFrame/SQL/Catalyst) engine providing the
query and data-processing capabilities of the reference ETL codebase
(chongqiongjie/etl-cascalog — a Cascalog/Cascading/Hadoop Datalog DSL), plus a
first-class LLM-training-data-pipeline surface (dedup, similarity search, text
analysis, multimodal columns) and a Structured Streaming surface.

Design stance (SURVEY.md §7): pure DataFrame/SQL — declare the logical plan,
let Catalyst+Tungsten pick the physical strategy. No RDDs, no custom Catalyst
rules for parity. Datalog semantics preserved explicitly:

- implicit non-null of ``?vars``            -> :func:`filters.require_non_null`
- join-type-by-nullability (J1-J3)          -> :mod:`operators.joins`
- group-by-all-non-aggregated-outputs       -> plain ``groupBy`` (caller lists dims)
- calendar-keyed lags (W1/W2)               -> :mod:`operators.periods`
"""

from etl_cascalog_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
