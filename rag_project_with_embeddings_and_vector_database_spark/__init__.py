"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference RAG evaluation pipeline
(``Sushanth-majeti/RAG-project-with-embeddings-and-vector-database``),
re-expressed Spark-first and extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is a DataFrame; the "vector database" is a partitioned parquet
table; ANN is broadcast brute-force (exact) or LSH (approximate, the scale
path); inference is Arrow pandas UDFs; no custom Catalyst rules are needed
(see SURVEY.md §4).
"""

__version__ = "0.1.0"

from .config import EngineConfig
from .session import get_spark

__all__ = ["EngineConfig", "get_spark", "__version__"]
