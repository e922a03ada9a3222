"""PySpark-native analytics engine with the capabilities of
go-graphite/carbon-clickhouse (reference studied at /root/reference).

Layers:
- functions/: canonicalization parity (escape, tags, paths, dates)
- sources/:   wire-protocol decoders -> points DataFrames
- operators/: filters, index/tagged derivations, dedup, rollup
- pipeline:   batch multi-table fan-out (the writer/uploader pipeline)
- streaming/: Structured Streaming ingestion
- query/:     metric-find / tag-find / series-read surface
- datapipe/:  LLM-training-data operators (dedup, similarity,
              multimodal, text analysis) built on the same engine
"""

__version__ = "0.1.0"
