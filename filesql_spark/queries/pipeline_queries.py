"""LLM-data-pipeline operator queries (dedup / similarity / text analysis).

Populated as filesql_spark.pipeline grows; see that package for the
implementations. Placeholder module so the registry import graph is stable.
"""
