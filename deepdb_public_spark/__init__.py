"""deepdb_public_spark: PySpark-native engine with DeepDB's query and
data-processing capabilities (see README.md)."""

from .engine import Engine, default_session

__all__ = ["Engine", "default_session"]
