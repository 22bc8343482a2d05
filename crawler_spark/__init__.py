"""crawler_spark — a PySpark-native URL-frontier + fetch-scheduler engine.

A from-scratch reimplementation of the *capabilities* of the Go crawler
framework ``fanyang01/crawler`` (reference at /root/reference), built
Spark-first: the frontier, URL-seen set, politeness scheduler, and crawl
lifecycle are DataFrame programs over snapshot tables, with all per-row
work in vectorized Arrow/pandas UDFs.

Layout:
    functions/  — scalar/vectorized column functions (canonicalize, hash,
                  text analysis, vector math, image stubs)
    operators/  — relational building blocks (ordering, politeness
                  selection, dedupe, bloom, top-k)
    plans/      — the iterative crawl superstep loop + the serial oracle
    sources/    — deterministic synthetic fixtures (link graph, payloads)
    state/      — snapshot store (atomic parquet commits, resume)
"""

__version__ = "0.1.0"
