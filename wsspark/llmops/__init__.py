"""LLM-training-data pipeline operators (SURVEY.md §7.2 step 12 /
BASELINE.json north star): deduplication, similarity search, text analysis,
document fingerprinting, multimodal column plumbing.

Design rules for 100 TB inputs:
- everything is expression-first (xxhash64 or the portable md5-prefix hash,
  split / transform / aggregate — all JVM-side inside codegen); Python
  appears only in Arrow-batched ``mapInPandas`` for genuinely
  non-relational work (multimodal decode).
- no driver-side collects; candidate generation is always blocked/bucketed
  (LSH bands, IVF cells) so the quadratic step runs within small groups.
"""
