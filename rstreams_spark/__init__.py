"""rstreams_spark — a PySpark-native engine with the query and
data-processing capabilities of CallistoLabsNYC/rstreams, re-expressed
Spark-first (DataFrame/Catalyst/Structured Streaming), plus the
LLM-data-pipeline operators (dedup, similarity search, multimodal
plumbing, text analysis) needed at 100 TB scale.
"""

from .model import RStream
from .session import get_spark, load_tables

__all__ = ["RStream", "get_spark", "load_tables"]
__version__ = "0.1.0"
