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

# Optional explicit cap for Arrow's internal thread pools
# (MLRAY_ARROW_CPUS=n). Ray pins OMP_NUM_THREADS=1 per worker but
# Arrow's compute/IO pools default to os.cpu_count(). Default when
# unset: runtime.tune_allocator caps every process to 1 compute + 2 IO
# Arrow threads (parallelism here is process-level — one Ray task per
# core; uncapped pools measured a 7x per-task slowdown in the
# bucket-sort phase at 32-way concurrency from thread oversubscription).
# Setting MLRAY_ARROW_CPUS>0 replaces that default with the given width
# and suppresses the tune_allocator cap (the explicit knob wins);
# MLRAY_THREAD_CAP=0 disables the default cap without setting one.
import os as _os

_arrow_cap = int(_os.environ.get("MLRAY_ARROW_CPUS", "0"))
if _arrow_cap > 0:
    try:
        import pyarrow as _pa

        _pa.set_cpu_count(_arrow_cap)
        _pa.set_io_thread_count(max(2, _arrow_cap))
    except Exception:
        pass

# Allocator retention tuning (see runtime.py): without it every large
# Arrow/numpy/zlib buffer is a fresh mmap that re-page-faults per batch
# — measured as the dominant non-scaling cost on virtualized hosts.
from .runtime import tune_allocator as _tune_allocator

_tune_allocator()

IMAGE_SCHEMA_COLUMNS = [
    "image_id",  # string, the MERGE identity key
    "bytes",     # binary, encoded image payload
    "w",         # int32
    "h",         # int32
    "fmt",       # string, "jpeg" (lossy) | "png" (lossless)
    "caption",   # string
    "phash",     # int64, 64-bit perceptual (average) hash
]
