"""Structured Streaming pipelines (engine extension; SURVEY §7)."""
