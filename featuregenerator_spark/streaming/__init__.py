"""Structured Streaming variants of the temporal feature operators."""
