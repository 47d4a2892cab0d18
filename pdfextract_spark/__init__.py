"""pdfextract_spark — a from-scratch, PySpark-native re-expression of
CrossRef/pdfextract's main-content extraction pipeline over multi-turn
transcript tables (SURVEY.md), plus the large-scale training-data
operators (dedup, similarity, text analysis) that make the engine
useful at 100 TB.

Layout:
- core/       exact per-turn kernels (pure Python/numpy, Arrow-batched)
- operators/  reusable Spark DataFrame operators (Catalyst-native)
- sources/    table loaders + deterministic transcript synthesis
- plans/      end-to-end Spark plans (extract, metrics, resume)
- streaming/  incremental extraction via Structured Streaming
"""

from .settings import DEFAULT, Settings, Typesetter  # noqa: F401
