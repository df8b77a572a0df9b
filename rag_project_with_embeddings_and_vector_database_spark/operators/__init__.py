from . import chunking, dedup, embedding, joins, metrics, retrieval  # noqa: F401
