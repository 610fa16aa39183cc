"""recommendersystems_bigdata_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and data-processing
capability surface of the reference project ``sumedharai12/recommendersystems_bigdata``
(recommender systems on big data), extended with the LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis).

The operator inventory lives in SURVEY.md §2; every declared query key is
registered through :mod:`recommendersystems_bigdata_spark.registry` and is
checked by a DuckDB oracle (row-count + schema + order-insensitive value-hash).

Design stance (SURVEY.md §3-§4): declare logical plans with the DataFrame/SQL
API and let Catalyst + AQE pick physical strategy; Python only crosses the
JVM boundary through Arrow (pandas UDFs) and only where built-in functions
genuinely cannot express the semantics.
"""

from recommendersystems_bigdata_spark.session import get_spark
from recommendersystems_bigdata_spark.catalog import TABLES, load_table, register_views

__all__ = ["get_spark", "TABLES", "load_table", "register_views"]
__version__ = "0.1.0"
