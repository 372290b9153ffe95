"""Structured Streaming surface: incremental span-corpus extraction and
stateful event analytics."""
