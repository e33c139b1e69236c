"""LLM-data-pipeline queries: dedup, similarity, text analysis, multimodal.

Filled in as the operators land (SURVEY.md §2.C extension families).
"""

from __future__ import annotations

from tower_parse_spark.queries import Query

QUERIES: dict[str, Query] = {}
