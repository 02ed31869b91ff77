"""PySpark-native analytics engine with the query and data-processing
capabilities of tishiu/coinbase-data-pipeline, re-expressed Spark-first.

Everything here is declarative DataFrame/SQL so Catalyst plans the
physical execution; Python touches data only in the few inherently
sequential per-key operators (EWM family) via Arrow-batched
applyInPandas.
"""

__version__ = "0.1.0"
