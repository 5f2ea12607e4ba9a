"""Structured Streaming extensions (SURVEY.md §1.4, §2.8).

The reference is batch-only (Kafka is produce-only; no watermarks /
event-time windows / state anywhere) — streaming here is the
architectural extension the Spark rebuild gets natively.
"""
