"""Custom operators beyond plain Spark SQL: as-of join, dedup family,
similarity search, text analysis, multimodal column plumbing.

All are compositions of built-in DataFrame ops (window, explode, hash
functions, groupBy) — no Catalyst surgery, no row-at-a-time Python in
hot paths.
"""
