"""lakehouse_dba_tools_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``francopatano/lakehouse_dba_tools`` (a collection of Databricks DBA
notebooks), re-expressed as an importable, testable library of Spark
DataFrame/SQL operators, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing)
such an engine needs at 100 TB.

Design principles (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst does pushdown/pruning/join-selection.
- No row-at-a-time Python UDFs in hot paths; Arrow-batched pandas UDFs
  only where built-ins can't express the semantics.
- Every operator is a named function with a DuckDB-oracle differential
  test via ``__spark_entry__.py``.
"""

__version__ = "0.1.0"

from lakehouse_dba_tools_spark.session import get_session  # noqa: F401
from lakehouse_dba_tools_spark.sources.tables import load_tables, register_views  # noqa: F401
