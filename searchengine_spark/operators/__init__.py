"""Operator surface. Import submodules lazily-light:

  indexer    — staged checkpoint-resumable index build (+ salted aggs)
  frames     — the same build as pure lazy DataFrames
  query      — exact DAAT-equivalent relational top-k
  maxscore   — broadcast + partition-parallel MaxScore pruning scorer
  dedup      — exact / fingerprint / Jaccard / MinHash-LSH / SimHash
  similarity — cosine top-k, sign-LSH ANN, near-dup pairs
  textstats  — token counts, quality, lang-id, fingerprints
  multimodal — binary payload plumbing + Arrow decode stubs
"""
