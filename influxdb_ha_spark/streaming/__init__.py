"""Structured Streaming surface: continuous queries and streaming ingest."""

from .cq import ContinuousQuery, CQRunner  # noqa: F401
from .ingest_stream import stream_ingest_lines  # noqa: F401
