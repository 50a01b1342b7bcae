"""energy_emissions_lakehouse_spark — a PySpark-native analytics engine.

A Spark-first re-expression of the capabilities of the reference lakehouse
(GeorgeKaldiris/Energy-Emissions-Lakehouse, surveyed in SURVEY.md): a
medallion (bronze -> silver -> gold) pipeline, a star-schema warehouse layer,
the reference's analysis query suite, plus large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing,
structured streaming).

Everything is declarative DataFrame/SQL so Catalyst owns the physical plan;
no driver-side collect() in any data path.
"""

from energy_emissions_lakehouse_spark.session import get_spark
from energy_emissions_lakehouse_spark.registry import all_queries, all_oracle_sql, get_query

__version__ = "0.1.0"

__all__ = ["get_spark", "all_queries", "all_oracle_sql", "get_query", "__version__"]
