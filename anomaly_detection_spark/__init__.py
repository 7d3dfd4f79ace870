"""anomaly_detection_spark — a PySpark-native schema + constraint validation engine.

A from-scratch re-imagination of the per-record anomaly scorers in the
reference repo (nacekoprivec/anomaly-detection, read-only at /root/reference)
as column-level constraint, window, and drift checks over large tables,
expressed with the Spark DataFrame/SQL API (Catalyst-optimized, AQE-enabled)
and vectorized Arrow UDFs — zero per-row Python.

Status-code vocabulary follows the reference
(/root/reference/src/algorithms/anomaly_detection.py:41-50):
OK=1, Warning=0, Error=-1, Undefined=2.
"""

from anomaly_detection_spark.codes import (
    OK_CODE,
    WARNING_CODE,
    ERROR_CODE,
    UNDEFINED_CODE,
)

__version__ = "0.1.0"

__all__ = [
    "OK_CODE",
    "WARNING_CODE",
    "ERROR_CODE",
    "UNDEFINED_CODE",
]
