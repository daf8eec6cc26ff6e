"""Large-scale pipeline operators beyond the reference's surface.

The reference has no joins/aggregations/dedup (SURVEY.md §2.4); these
are the extension operators a 100 TB training-data pipeline needs,
expressed as DataFrame transformations (JVM-side, shuffle-aware):

- :mod:`dedup` — exact, n-gram Jaccard, MinHash+LSH, SimHash,
  embedding near-dup (hyperplane LSH), content-defined chunking.
- :mod:`similarity` — brute-force cosine top-k, multi-probe LSH ANN,
  IVF (k-means cells) ANN.
- :mod:`search` — BM25 top-k keyword retrieval over reusable
  posting-list reductions (the sparse twin of :mod:`similarity`).
- :mod:`text` — token stats, quality scoring, language ID,
  fingerprints, Gopher repetition filters, PII redaction.
- :mod:`multimodal` — opaque binary columns + Arrow-batched feature
  extraction / resize / frame sampling over the REAL stdlib codecs in
  :mod:`media_codecs` (PNG, WAV PCM, ISO BMFF mp4 mux/demux).
- :mod:`timeseries` — as-of join (backward/forward/nearest), range &
  interval-overlap joins, hypertable rollup, gap filling (LOCF /
  linear).
- :mod:`skew` — salted aggregation/join with deterministic
  content-hash salts (retry-safe).
- :mod:`sampling` — hash-based train/val/test splitting, stratified
  sampling, domain-mixture resampling, fixed-budget sequence packing.
- :mod:`layout` — Z-order (Morton) clustering for multi-dimensional
  parquet data skipping.
- :mod:`export` — sharded, order-preserving training-data writes
  with a verifiable manifest (counts, order bounds, id checksums),
  plus WebDataset tar shards (bit-reproducible, order-sensitive
  digest verification) for multimodal delivery.
- :mod:`sketches` — Count-Min heavy hitters with certificates, batch
  and streaming (persisted mergeable grid + pigeonhole admission).
- :mod:`profiling` — exact statistics suite (AUC/KS/Gini/Spearman/
  OLS/Welch/MI/χ², exact and weighted quantiles, PSI, calibration).
- :mod:`graph` — PageRank (uniform/personalized/weighted), label
  propagation, triangle census, link prediction, k-core.
- :mod:`bpe` — distributed BPE tokenizer training (vocabulary-sized
  rounds at any corpus size) and Arrow-batched encoding.
- :mod:`funnel` — ordered funnels, cohort retention, transition
  matrices, multi-model (first/last/linear) attribution.
- :mod:`expectations` — declarative data-quality gates compiled into
  one aggregate pass (not_null/unique/range/set/regex/foreign-key).
- :mod:`versioning` — corpus snapshot diffing (added/removed/changed/
  unchanged by content digest; payload never crosses the exchange).
- :mod:`_caches` — tracked persist() so harnesses release operator
  caches between catalog entries.
"""
