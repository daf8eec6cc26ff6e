"""Large-scale pipeline operators beyond the reference's surface.

The reference has no joins/aggregations/dedup (SURVEY.md §2.4); these
are the extension operators a 100 TB training-data pipeline needs,
expressed as DataFrame transformations (JVM-side, shuffle-aware):

- :mod:`dedup` — exact, n-gram Jaccard, MinHash+LSH, SimHash.
- :mod:`similarity` — brute-force cosine top-k, LSH-bucketed ANN.
- :mod:`text` — token stats, quality scoring, language ID, fingerprints.
- :mod:`multimodal` — opaque binary columns + Arrow-batched feature
  extraction plumbing (decode stubbed; no media libs in the container).
"""
