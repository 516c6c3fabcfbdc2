"""Structured Streaming pipelines sharing batch operator semantics."""
