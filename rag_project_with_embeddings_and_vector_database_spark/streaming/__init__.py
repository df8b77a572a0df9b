from .ingest import incremental_ingest, windowed_event_counts  # noqa: F401
