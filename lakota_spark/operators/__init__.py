"""Custom relational operators the reference lacks, built Spark-first.

Each operator is a composition of DataFrame primitives (the scalable path);
Pandas UDFs are used only where built-ins genuinely can't express the
semantics (see `multimodal.py`).
"""

from lakota_spark.operators.asof import asof_join
from lakota_spark.operators.kv import last_wins, update_zerofill

__all__ = ["asof_join", "last_wins", "update_zerofill"]
