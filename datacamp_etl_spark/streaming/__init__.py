"""Streaming & incremental-load operators.

The reference is strictly batch (SURVEY §2.10); its only
streaming-like concept is the incremental-load watermark (F2 + K3).
This package provides both the faithful batch form and the idiomatic
Structured Streaming upgrade."""

from datacamp_etl_spark.streaming.incremental import IncrementalLoader  # noqa: F401
