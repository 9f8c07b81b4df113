"""Training-data pipeline operators over web-scale text tables.

Everything here is pure Catalyst expression work (split / transform /
aggregate / zip_with higher-order functions, md5, regexp_*) — no Python in
the hot path — so the same operators run unchanged from the 500-row test
tables to a 10^12-row corpus; shuffles appear only where semantically
required (LSH bucket joins, candidate-pair verification) and are
documented per function.

Modules:
- dedup: exact, MinHash+LSH, SimHash, n-gram Jaccard near-duplicate
  detection
- similarity: brute-force cosine top-k and hyperplane-LSH bucketed ANN
- textanalysis: language ID, quality scoring, token counting, document
  fingerprints
- multimodal: binary media columns — typed metadata + batch feature
  extraction plumbing (decoders stubbed deterministically; the image/audio
  libs are not vendored)
"""
