"""Structured Streaming surface (the reference is batch-only; this is
north-of-reference capability for the events stream table)."""
