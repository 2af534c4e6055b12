"""etl_rs_ray — a Ray-Data-native CDC / incremental-ingest engine.

From-scratch reimplementation of the data-processing capabilities of
CaoKha/etl-rs (see SURVEY.md) on ray.data.Dataset: per-column string
normalization (TransformChain), key-based dedup, change-event (binlog)
replay into a lake upsert table with last-writer-wins + tombstones,
exactly-once manifest commits, schema evolution, and checkpoint/resume.
"""

__version__ = "0.1.0"
