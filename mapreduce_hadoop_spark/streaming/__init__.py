"""Structured Streaming variants of the engine's stateful operators."""
