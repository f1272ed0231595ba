"""Utilities: timing/tracing, metrics, output writers."""
