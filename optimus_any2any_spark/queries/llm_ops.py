"""LLM-training-data pipeline operators (dedup / similarity / text).

Populated incrementally; see optimus_any2any_spark.operators for the
implementations.
"""

from __future__ import annotations
