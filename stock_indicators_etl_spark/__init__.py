"""stock_indicators_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``sasmi825/stock-indicators-etl`` (a single-threaded
pandas/TA-Lib stock-indicator ETL), extended with the operators a
large-scale training-data pipeline needs (dedup, similarity search,
text analysis, multimodal plumbing).

Design tenets (see SURVEY.md):
- DataFrame/SQL declarative plans; let Catalyst/Tungsten optimize.
- Window functions over ``partitionBy(series_key).orderBy(time)`` for
  everything frame-expressible; Arrow-batched ``applyInPandas`` only
  for the recursive Wilder/EMA indicator family.
- int64 epoch-nanosecond timestamps end-to-end for bit-parity with the
  reference (``stockdata/utils.py:11``, ``indicators.py:9-22``).
"""

__version__ = "0.1.0"

from stock_indicators_etl_spark.config import IndicatorConfig
from stock_indicators_etl_spark.session import get_spark

__all__ = ["IndicatorConfig", "get_spark", "__version__"]
