"""LLM-data-pipeline operators (BASELINE.json north star, SURVEY §7.2 ph. 6).

Beyond the reference's own surface: the operations a large-scale
training-data pipeline needs, each designed as partition-parallel DataFrame
transforms that hold at 100 TB:

- text analysis: language-ID, quality scoring, token counting, fingerprints
  (text.py) — pure column expressions, whole-stage codegen, no UDFs;
- deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  embedding-cosine (dedup.py) — shuffle-on-key designs with banding/blocking
  so no step is O(n²) on the full corpus;
- similarity search: brute-force cosine top-k baseline + random-hyperplane
  LSH bucketed variant (similarity.py);
- multimodal columns: binary payloads + Arrow-batched Pandas-UDF decode
  plumbing (multimodal.py).

Every operator that is SQL-expressible ships a DuckDB oracle in
filesql_spark/queries/pipeline_queries.py; hash functions are portable
(md5-derived) so Spark and DuckDB agree bit-for-bit.
"""
