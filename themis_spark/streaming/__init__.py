"""Structured Streaming wrappers around the batch validation engine."""
