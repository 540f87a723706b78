"""Pushdown read provider: a committed snapshot as a standard Arrow
stream any external engine can scan, with deletion vectors applied as
row selections and zone-map predicate pruning INSIDE the scan.

This is the ``moonlink_datafusion`` TableProvider analog
(/root/reference/src/moonlink_datafusion/src/table_provider.rs:99-140:
DV blobs become parquet ``RowSelection`` skips in the provider's own
scan). The repo's other handoffs (``scan_manifest``, RPC, the Delta /
Iceberg exports) make external engines REPLAN from file lists and do
their own delete handling; this provider instead hands them a
``pyarrow.RecordBatchReader`` whose stream is already pruned and
DV-masked — DuckDB (``con.register("t", reader)``), pandas, polars or
any Arrow consumer reads the live rows of the snapshot without knowing
the manifest format at all.

Scale shape: the stream materializes ONE fragment at a time (bounded by
the fragment size cap), prunes fragments by zone maps before any file
opens, and prunes columns at the parquet read. ``opened_fragments``
records exactly which fragments were opened — the test proves pruned
fragments never open.
"""

from __future__ import annotations

import pyarrow as pa

from .manifest import FragmentMeta  # noqa: F401  (re-export for callers)


class TableProvider:
    """Snapshot-pinned provider. Resolve once, scan many times."""

    def __init__(self, root: str, version: int | None = None, *,
                 at_lsn: int | None = None):
        from .export import _resolve_version
        from .schema import table_schema
        self.root = root
        self.snapshot = _resolve_version(root, version, at_lsn)
        self.schema = table_schema(self.snapshot)
        #: fragment ids opened by scans (instrumentation; tests assert
        #: pruned fragments never appear here)
        self.opened_fragments: list[str] = []

    # -- planning -----------------------------------------------------

    def plan(self, predicate: dict | None = None) -> list[FragmentMeta]:
        """Fragments surviving zone-map pruning for ``predicate``
        ({col: (lo, hi)}); no file is opened."""
        from .sources.scan import prune_fragments
        frags = [f for f in self.snapshot.fragments if f.live_rows > 0]
        if predicate:
            frags = prune_fragments(frags, predicate)
        return frags

    # -- scanning -----------------------------------------------------

    def scanner(self, columns: list[str] | None = None,
                predicate: dict | None = None) -> pa.RecordBatchReader:
        """Arrow stream of the snapshot's LIVE rows: zone-map-pruned
        fragments, column-pruned parquet reads, DV positions dropped,
        residual predicate applied exactly. Predicate columns the
        caller did not project are still READ so the residual filter
        is exact, then dropped from the output."""
        from .fragments import read_fragment
        from .schema import conform_table
        from .sources.scan import _row_filter

        out_schema = self.schema
        read_cols = columns
        if columns is not None:
            out_schema = pa.schema(
                [f for f in out_schema if f.name in columns])
            if predicate:
                read_cols = list(dict.fromkeys(
                    list(columns) + [c for c in predicate
                                     if c in self.schema.names]))
        read_schema = self.schema if read_cols is None else pa.schema(
            [f for f in self.schema if f.name in read_cols])
        frags = self.plan(predicate)
        opened = self.opened_fragments

        def gen():
            for meta in frags:
                opened.append(meta.fragment_id)
                t = read_fragment(self.root, meta, columns=read_cols,
                                  tolerant_columns=True)
                t = conform_table(t, read_schema)
                if predicate:
                    t = _row_filter(t, predicate)
                t = t.select(out_schema.names)
                for rb in t.to_batches():
                    yield rb

        return pa.RecordBatchReader.from_batches(out_schema, gen())

    def read_all(self, columns: list[str] | None = None,
                 predicate: dict | None = None) -> pa.Table:
        return self.scanner(columns, predicate).read_all()
