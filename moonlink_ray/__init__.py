"""moonlink_ray — a Ray-Data-native table-maintenance engine.

A from-scratch batch reimplementation of the capabilities of the reference
streaming-ingestion engine (``nbiscaro/moonlink``, Rust, Iceberg-native;
surveyed in SURVEY.md) on idiomatic Ray Data primitives:

- tables are immutable Parquet *fragments* + deletion-vector sidecars,
  tracked by a versioned JSON *manifest* with an atomic pointer swap
  (moonlink analog: Iceberg snapshots + ``version-hint.text``,
  ``/root/reference/src/moonlink/src/storage/iceberg/file_catalog.rs``);
- MERGE INTO = hash-bucketed ``groupby`` + an LSN-ordered fold
  (moonlink analog: index-probe upsert/delete,
  ``src/moonlink/src/storage/mooncake_table/snapshot.rs``);
- compaction = DV-filter + actor-pool image re-encode + size-capped
  fragment rewrite (``src/moonlink/src/storage/compaction/compactor.rs``);
- Z-order clustering (absent in moonlink; added per the north rule);
- snapshot expire + orphan GC (added per the north rule).

Everything flows through ``ray.data.Dataset`` with zero-copy Arrow batches.
"""

__version__ = "0.1.0"

IMAGE_SCHEMA_COLUMNS = [
    "image_id",  # string, the MERGE identity key
    "bytes",     # binary, encoded image payload
    "w",         # int32
    "h",         # int32
    "fmt",       # string, "jpeg" (lossy) | "png" (lossless)
    "caption",   # string
    "phash",     # int64, 64-bit perceptual (average) hash
]
