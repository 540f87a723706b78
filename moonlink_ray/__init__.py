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

# Optional cap for Arrow's internal thread pools (MLRAY_ARROW_CPUS=n).
# Ray pins OMP_NUM_THREADS=1 per worker but Arrow's compute/IO pools
# default to os.cpu_count(); on a machine shared beyond the Ray session
# that can leak parallelism. Default: uncapped — the scaling bench pins
# each parallelism level to a physical core set with sched_setaffinity
# instead (bench.py run_child), which bounds ALL thread pools honestly
# and lets exchange-heavy stages use intra-task Arrow threads.
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
