"""Structured Streaming wiring: ingest pipeline, windowed latency."""
