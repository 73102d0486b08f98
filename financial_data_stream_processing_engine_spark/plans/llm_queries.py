"""Catalog entries: LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal) over documents/embeddings.
"""

from __future__ import annotations
