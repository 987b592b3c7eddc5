"""Structured Streaming surfaces.

The reference's streaming is ingestion micro-batching only (rotate /
upload / queue / worker, N13-N15) — re-expressed here as a file-source
stream + foreachBatch, which upgrades the semantics: checkpointing
gives exactly the at-least-once delivery the DB-backed queue provided
(SURVEY.md §2.1 N14), and the landing directory IS the blob landing
zone on a cluster.

Event-time operators (watermarks, windows, streaming dedup) are
additive capabilities the reference never had; exposed because a
100 TB pipeline wants them (SURVEY.md §2.2 streaming row).
"""

from .ingest_stream import start_ingest_stream, windowed_event_counts

__all__ = ["start_ingest_stream", "windowed_event_counts"]
