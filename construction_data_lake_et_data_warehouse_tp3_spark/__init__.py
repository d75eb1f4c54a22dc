"""PySpark-native analytics engine with the capability surface of the
reference data-lake + data-warehouse pipeline
(`cocoalice03/Construction-Data-Lake-et-Data-warehouse_TP3`, surveyed in
/root/repo/SURVEY.md).

Architecture (Spark-first, NOT a port):

- ``session``    — SparkSession factory + runtime tuning (AQE, shuffle
                   partitions, Arrow) sized for local[32] tests but designed
                   for multi-executor clusters.
- ``sources``    — batch parquet registry over the testdata star schema,
                   synthetic payload generator (reference kafka_producer.py),
                   streaming sources (rate / file / kafka-shaped).
- ``functions``  — scalar function library (SURVEY §2.8): anonymization,
                   bucketing, currency conversion, id generation.
- ``operators``  — the query surface (SURVEY §2.2-2.7 + beyond-reference
                   dedup / similarity / text analysis), each expressed with
                   DataFrame/SQL built-ins so Catalyst optimizes them.
- ``plans``      — plan-inspection helpers (pushdown / broadcast / codegen
                   assertions used by tests and perf work).
- ``lake``       — feed catalog, date/version partitioned writers, retention,
                   permissions (SURVEY §2.11).
- ``warehouse``  — star-schema MERGE upserts (SURVEY §2.5).
- ``streaming``  — Structured Streaming ingest + foreachBatch warehouse sink
                   (SURVEY §2.9).
"""

__version__ = "0.1.0"

import os as _os

# Python workers must import this package to unpickle the mapInPandas
# kernels (multimodal decode, pandas UDAFs): cloudpickle serializes the
# nested `run` closures by value but their module-level helpers
# (decode_wav / decode_ppm / ...) by reference.  When the launching
# process imports the package from a cwd other than the repo root, the
# forked workers would fail with an ImportError inside read_udfs — so
# export the package parent onto PYTHONPATH *at import time*, before any
# SparkSession (and hence the worker-spawning JVM) starts.
_PKG_PARENT = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _PKG_PARENT not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _PKG_PARENT + (_os.pathsep + _pp if _pp else "")
    )
del _os, _pp
