"""Sinks: snapshot/manifest table format with MERGE-by-key semantics."""
