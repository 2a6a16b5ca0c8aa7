"""Custom data sources (Spark 4 Python DataSource API)."""

from etl_cascalog_spark.sources.synthetic import SyntheticEventsDataSource

__all__ = ["SyntheticEventsDataSource"]
