"""redskins_rule_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference pipeline chaseeanderson/redskins-rule (see SURVEY.md), plus
first-class large-scale training-data operators (dedup, similarity
search, text analysis, multimodal columns).

Design stance (SURVEY.md §7.0):
  * DataFrame/SQL only — declare logical plans, let Catalyst/Tungsten
    pick physical strategy.
  * Every reference operator (SURVEY.md §2) is a named, unit-tested
    function here; pipelines are thin compositions.
  * IO abstracted behind `sources` so local parquet and object-store
    paths are interchangeable.
  * UDFs are the slow path: native expressions first, Arrow-batched
    pandas UDFs only where semantics require Python.
"""

from redskins_rule_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
