"""Structured Streaming surface.

The reference is strictly synchronous batch (SURVEY §2.8: no watermarks or
event-time windows anywhere), and the crawl loop here is deliberately
batch-incremental (Iceberg-style checkpoints per round — resumability
mandated by the north rule matches batch snapshots better than a streaming
query). This package covers the stream-shaped edges a production crawl
still has: ingesting fetch/metrics events as they land and maintaining
event-time windowed aggregates with late-data handling.
"""

from .events import stream_files, run_to_memory, windowed_event_counts  # noqa: F401
