"""Large-scale training-data pipeline operators.

Beyond the reference's own surface (BASELINE.json north star): exact and
approximate deduplication, similarity search over embeddings, text
analysis, and multimodal-column plumbing — all built on DataFrame ops so
they hold at 100 TB (shuffle-conscious, no driver-side loops over data).
"""
