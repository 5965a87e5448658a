"""reddit_data_engineering_project_spark — a PySpark-native analytics engine.

Brand-new engine (not a port) with the query and data-processing
capabilities of the ``ManojGowda27/Reddit_Data_Engineering_project``
reference pipeline, re-expressed Spark-first (DataFrame/SQL/Catalyst/
Structured Streaming) and extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale.

Blueprint: ``SURVEY.md`` at the repo root. Correctness is checked
query-by-query against a DuckDB oracle (see ``registry.py`` and
``__spark_entry__.py``).
"""

__version__ = "0.1.0"
