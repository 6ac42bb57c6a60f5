"""mhap_spark — a from-scratch PySpark-native near-duplicate detection +
clustering engine with the query/data-processing capabilities of marbl/MHAP.

Reference semantics (cited per-module as ``mhap/<path>:<lines>`` ≡
``/root/reference/src/main/java/edu/umd/marbl/mhap/<path>:<lines>``) are
re-expressed Spark-first: DataFrame/Catalyst plans, Arrow-vectorized pandas
UDFs for sketch kernels, explicit partitioning/skew handling, and
parquet-checkpointed resumable stages.
"""

from mhap_spark.config import MhapConfig

__all__ = ["MhapConfig"]
__version__ = "0.1.0"
