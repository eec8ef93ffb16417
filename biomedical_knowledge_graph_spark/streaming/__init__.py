"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8) and the north_rule asks for
batch + resumability, which sinks/table_format.py provides. This package
adds the streaming ingest path a continuously-crawled pages corpus needs:
the same extraction/linking kernels applied over readStream with
watermarked windows.
"""
