"""Streaming-shaped operators (SURVEY.md §2.9): windowed metrics and an
optional Structured Streaming wrapper for the round loop."""
