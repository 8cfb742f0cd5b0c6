"""Structured Streaming surface: incremental raw-zone ingestion."""
