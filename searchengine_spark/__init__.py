"""searchengine_spark — PySpark-native inverted-index + BM25 engine
with training-data pipeline operators (dedup / similarity / text
analysis / multimodal). See README.md and COVERAGE.md."""

__version__ = "0.1.0"
