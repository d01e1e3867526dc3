"""Structured-Streaming variants of the frontier pipeline."""
