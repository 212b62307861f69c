"""nebuia_vector_db_spark — a PySpark-native analytics/vector engine.

A brand-new, Spark-first re-expression of the capabilities of
``dist-bit/nebuia_vector_db`` (reference: a Go HTTP vector-search
service, ``main.go``), extended with the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale.

Architecture stance (SURVEY.md §7.0): a *library*, not a server. The
reference's four HTTP routes (``main.go:162-167``) become Python call
signatures on :class:`VectorEngine`; storage is a ``collection``-
partitioned Parquet table instead of MinIO JSON blobs; every query is
a declarative DataFrame plan that Catalyst optimizes (partition
pruning ≙ prefix listing, column pruning, TakeOrderedAndProject ≙
sort+truncate top-k).
"""

from nebuia_vector_db_spark.engine import VectorEngine
from nebuia_vector_db_spark.session import get_spark
from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

__all__ = ["VectorEngine", "get_spark", "SnapshotTable"]
__version__ = "0.3.0"  # round 3: real codecs, transactional storage, z-order
