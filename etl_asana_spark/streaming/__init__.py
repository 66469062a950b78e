"""Structured Streaming jobs over the events stream (SURVEY §2.10, §3.3)."""
