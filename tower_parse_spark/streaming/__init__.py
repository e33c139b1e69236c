"""Structured Streaming parity layer.

The reference is a streaming engine: TCP line source -> regex projection ->
per-group count packs -> columnar sink (SURVEY.md §3.1). This package
re-expresses that dataflow on Structured Streaming:

- sources.py  — socket / rate-generator / file line sources (A1-A5)
- packs.py    — exact-count packs with remainder carry across micro-batches
                (A17 streaming form, applyInPandasWithState)
- pipeline.py — parse plan on a stream + checkpointed partitioned parquet
                sink + graceful stop (A18-A22)
"""
