"""scholar_stream_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the scholar-stream reference pipeline (OpenAlex REST →
Firehose → Snowflake RAW/CURATED → dashboard), re-expressed as:

- Structured Streaming sources/sinks instead of Firehose (``sources/``,
  ``streaming/``)
- DataFrame/Catalyst logical plans instead of Snowflake views
  (``operators/views.py``)
- A role-scoped in-session catalog instead of Snowflake RBAC + masking
  policies (``operators/masking.py``, ``plans/catalog.py``)
- An extended large-scale training-data operator surface (dedup,
  similarity search, text analysis, multimodal columns) the reference
  does not have (``operators/dedup.py`` etc.)

Everything is declarative DataFrame API so Catalyst/Tungsten/AQE pick the
physical strategy; Python UDFs are avoided in all hot paths.
"""

from scholar_stream_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
