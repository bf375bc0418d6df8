"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.8) — its closest analogue to
streaming is checkpoint-resume, which lives in lineage.py. This package adds
the streaming entry points a continuously-crawling webtext pipeline needs:
micro-batch extraction with exactly-once sinks, and watermarked event-time
aggregation over the events stream.
"""
