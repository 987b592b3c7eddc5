"""Custom operators beyond plain Spark SQL.

- ``asof``       as-of (nearest-earlier) join via union+window
- ``rangejoin``  time-window interval join via bucket equi-join
- ``bucketing``  bucketed (shuffle-free join) + date-partitioned layouts
- ``dedup``      exact / minhash-LSH / simhash(+hamming bands) / ngram
- ``dedup_index`` persistent minhash-LSH band index (build / CDC
                 refresh / probe) over snapshot tables
- ``graph``      connected components (large-star/small-star) for
                 near-dup cluster resolution
- ``compaction`` OPTIMIZE-style small-file bin packing (coalesce or
                 range-clustered rewrite, atomic dir swap)
- ``similarity`` brute-force GEMM, hyperplane LSH, IVF, SQ8 quantization
- ``split``      deterministic train/val/test split, stratified sampling
- ``skew``       two-phase salted aggregation
- ``text``       langid, quality, tokens, fingerprints, tf-idf, PII redact
- ``resample``   bucketed grouped-map (applyInPandas) resampling
- ``multimodal`` binary payload columns, real PPM/BMP decode, feature/frames kernels
- ``funnel``     windowFunnel with ClickHouse strict-mode parity
                 (JVM fold over per-user sorted arrays; recursive-CTE
                 oracle generator; pure-Python twin for streaming)

All are compositions of built-in DataFrame ops (window, explode, hash
functions, groupBy) or Arrow-vectorized numpy kernels where the math
is a matrix product — no Catalyst surgery, no row-at-a-time Python in
hot paths.
"""
