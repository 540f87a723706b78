"""CLI entry point — the batch analog of moonlink's backend API
(``optimize_table`` / ``create_snapshot`` / ``scan_table`` / ``load_files``,
``/root/reference/src/moonlink_backend/src/lib.rs:141-350`` and RPC
surface ``moonlink_rpc/src/lib.rs:27-38``). Each subcommand is one
maintenance job, designed to be launched via ``ray job submit``:

    python -m moonlink_ray.engine bootstrap --root T --rows 10000
    python -m moonlink_ray.engine append   --root T --paths rows.parquet
    python -m moonlink_ray.engine merge    --root T --cdc c.parquet [--run-id R]
    python -m moonlink_ray.engine compact  --root T [--mode best_effort|force|full]
    python -m moonlink_ray.engine cluster  --root T
    python -m moonlink_ray.engine optimize --root T   # fused compact+cluster
    python -m moonlink_ray.engine follow   --root T --cdc-dir D  # tail CDC dir
    python -m moonlink_ray.engine expire   --root T --keep-last 2
    python -m moonlink_ray.engine scan     --root T [--snapshot V] --out out.parquet
    python -m moonlink_ray.engine scan-manifest --root T [--snapshot V | --at-lsn L]
    python -m moonlink_ray.engine export-delta --root T --out DIR [--snapshot V]
    python -m moonlink_ray.engine sync-delta --root T --out DIR  # incremental
    python -m moonlink_ray.engine vacuum-delta --out DIR --keep-last 2
    python -m moonlink_ray.engine alter    --root T [--add tag:string] [--drop caption]
    python -m moonlink_ray.engine status   --root T
    python -m moonlink_ray.engine config   --root T [--set compaction.small_file_bytes=8388608]

Only this CLI owns the Ray session (guarded init).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    p = argparse.ArgumentParser(prog="moonlink_ray.engine")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, **kw):
        s = sub.add_parser(name)
        s.add_argument("--root", required=True)
        return s

    s = add("bootstrap")
    s.add_argument("--rows", type=int, required=True)
    s.add_argument("--rows-per-fragment", type=int, default=256)
    s = add("load-files")
    s.add_argument("--paths", required=True, nargs="+")
    s.add_argument("--max-lsn", type=int, default=0)
    s = add("append")
    s.add_argument("--paths", required=True, nargs="+")
    s.add_argument("--max-lsn", type=int, default=None)
    s.add_argument("--run-id", default=None)
    s = add("merge")
    s.add_argument("--cdc", required=True, nargs="+")
    s.add_argument("--run-id", default=None)
    s.add_argument("--num-buckets", type=int, default=None)
    s = add("follow")
    s.add_argument("--cdc-dir", required=True)
    s.add_argument("--poll", type=float, default=None)
    s.add_argument("--idle-stop", type=int, default=None,
                   help="stop after this many empty polls; 0 = forever")
    s = add("compact")
    s.add_argument("--mode", default="best_effort",
                   choices=["best_effort", "force", "full"])
    s.add_argument("--run-id", default=None)
    s = add("cluster")
    s.add_argument("--run-id", default=None)
    s.add_argument("--curve", default=None, choices=["zorder", "hilbert"])
    s.add_argument("--exchange", default=None, choices=["plasma", "spill"])
    s = add("optimize")
    s.add_argument("--run-id", default=None)
    s.add_argument("--mode", default="full", choices=["full", "incremental"])
    s.add_argument("--curve", default=None, choices=["zorder", "hilbert"])
    s.add_argument("--exchange", default=None, choices=["plasma", "spill"])
    s = add("expire")
    s.add_argument("--keep-last", type=int, default=None)
    s.add_argument("--keep-orphans", action="store_true")
    s = add("config")
    s.add_argument("--set", nargs="*", default=[], metavar="SECTION.KEY=VALUE",
                   help="persist overrides, e.g. compaction.small_file_bytes=8388608")
    s = add("scan")
    s.add_argument("--snapshot", type=int, default=None)
    s.add_argument("--at-lsn", type=int, default=None,
                   help="read table state as of this replication LSN")
    s.add_argument("--out", required=True)
    s = add("scan-manifest")
    s.add_argument("--snapshot", type=int, default=None)
    s.add_argument("--at-lsn", type=int, default=None,
                   help="describe table state as of this replication LSN")
    s = add("export-iceberg")
    s.add_argument("--snapshot", type=int, default=None)
    s.add_argument("--at-lsn", type=int, default=None)
    s.add_argument("--out", required=True,
                   help="fresh directory for the Iceberg v2 table")
    s = add("sync-iceberg")
    s.add_argument("--snapshot", type=int, default=None)
    s.add_argument("--out", required=True,
                   help="existing Iceberg export to bring up to date")
    s = add("export-delta")
    s.add_argument("--snapshot", type=int, default=None)
    s.add_argument("--at-lsn", type=int, default=None)
    s.add_argument("--out", required=True,
                   help="fresh directory for the Delta Lake table")
    s = add("sync-delta")
    s.add_argument("--snapshot", type=int, default=None)
    s.add_argument("--out", required=True,
                   help="existing Delta export to bring up to date")
    s = sub.add_parser("vacuum-delta")  # export-side GC: no table root
    s.add_argument("--out", required=True,
                   help="Delta export to garbage-collect")
    s.add_argument("--keep-last", type=int, default=2,
                   help="log versions kept time-travelable")
    s = sub.add_parser("vacuum-iceberg")  # expire_snapshots + orphan GC
    s.add_argument("--out", required=True,
                   help="Iceberg export to garbage-collect")
    s.add_argument("--keep-last", type=int, default=2,
                   help="snapshots kept time-travelable")
    s = add("alter")
    s.add_argument("--add", nargs="*", default=[], metavar="NAME:TYPE",
                   help="columns to add, e.g. tag:string score:float64")
    s.add_argument("--drop", nargs="*", default=[], metavar="NAME")
    add("status")
    add("metrics")
    s = sub.add_parser("serve")   # REST surface: many tables, one base
    s.add_argument("--base", required=True,
                   help="directory holding one table root per name")
    s.add_argument("--port", type=int, default=8030)
    s.add_argument("--host", default="127.0.0.1")
    s = sub.add_parser("serve-rpc")  # socket RPC: base/<db>/<table>
    s.add_argument("--base", required=True,
                   help="warehouse dir: tables live at base/<db>/<table>")
    s.add_argument("--port", type=int, default=8640)
    s.add_argument("--host", default="127.0.0.1")
    args = p.parse_args(argv)

    import ray
    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from .manifest import current_version, load
    out = {}
    if args.cmd == "bootstrap":
        from .bootstrap import bootstrap_images_table
        bootstrap_images_table(args.root, args.rows,
                               rows_per_fragment=args.rows_per_fragment)
        out = {"version": current_version(args.root)}
    elif args.cmd == "load-files":
        from .bootstrap import register_parquet_files
        snap = register_parquet_files(args.root, args.paths,
                                      max_lsn=args.max_lsn)
        out = {"version": snap.version, "fragments": len(snap.fragments),
               "rows": snap.total_rows}
    elif args.cmd == "append":
        import ray.data as rd
        from .bootstrap import append_dataset
        snap = append_dataset(args.root, rd.read_parquet(args.paths),
                              run_id=args.run_id, max_lsn=args.max_lsn)
        out = {"version": snap.version, "fragments": len(snap.fragments),
               "rows": snap.total_rows}
    elif args.cmd == "merge":
        from .pipelines.merge import merge
        snap = merge(args.root, args.cdc, run_id=args.run_id,
                     num_buckets=args.num_buckets)
        out = {"version": snap.version, "max_lsn": snap.max_lsn,
               "fragments": len(snap.fragments)}
    elif args.cmd == "follow":
        from .pipelines.follow import follow
        from .table_config import load_table_config
        tc = load_table_config(args.root).follow
        poll = tc.poll_interval if args.poll is None else args.poll
        idle = tc.idle_cycles if args.idle_stop is None else args.idle_stop
        out = follow(args.root, args.cdc_dir, poll_interval=poll,
                     idle_cycles=idle or None)
    elif args.cmd == "compact":
        from .pipelines.compact import compact
        from .table_config import load_table_config
        snap = compact(args.root, mode=args.mode, run_id=args.run_id,
                       cfg=load_table_config(args.root).compaction)
        out = {"version": snap.version if snap else None,
               "noop": snap is None}
    elif args.cmd == "cluster":
        from .pipelines.cluster import cluster
        from .table_config import load_table_config
        tc = load_table_config(args.root).cluster
        snap = cluster(args.root, run_id=args.run_id,
                       curve=args.curve or tc.curve,
                       exchange=args.exchange or tc.exchange,
                       hot_threshold=tc.hot_threshold,
                       fragment_target_bytes=tc.fragment_target_bytes)
        out = {"version": snap.version if snap else None}
    elif args.cmd == "optimize":
        from .pipelines.optimize import optimize
        from .table_config import load_table_config
        tc = load_table_config(args.root)
        snap = optimize(args.root, run_id=args.run_id, mode=args.mode,
                        cfg=tc.compaction,
                        hot_threshold=tc.cluster.hot_threshold,
                        curve=args.curve or tc.cluster.curve,
                        exchange=args.exchange or tc.cluster.exchange)
        out = {"version": snap.version if snap else None,
               "noop": snap is None}
    elif args.cmd == "expire":
        from .pipelines.expire import expire
        from .table_config import load_table_config
        keep = (load_table_config(args.root).expire.keep_last
                if args.keep_last is None else args.keep_last)
        out = expire(args.root, keep_last=keep,
                     clean_orphans=not args.keep_orphans)
    elif args.cmd == "config":
        from .table_config import load_table_config, set_table_config
        if getattr(args, "set"):
            bad = [a for a in getattr(args, "set") if "=" not in a]
            if bad:
                raise SystemExit(
                    f"engine config --set: expected section.key=value, got "
                    f"{bad[0]!r}")
            assigns = dict(a.split("=", 1) for a in getattr(args, "set"))
            tc = set_table_config(args.root, assigns)
        else:
            tc = load_table_config(args.root)
        out = tc.to_dict()
    elif args.cmd == "scan":
        from .sources.scan import scan
        ds = scan(args.root, version=args.snapshot, at_lsn=args.at_lsn)
        ds.write_parquet(args.out)
        out = {"rows": ds.count(), "out": args.out}
    elif args.cmd == "scan-manifest":
        from .sources.scan import scan_manifest
        out = scan_manifest(args.root, version=args.snapshot,
                            at_lsn=args.at_lsn)
    elif args.cmd == "export-iceberg":
        from .iceberg import export_iceberg
        out = export_iceberg(args.root, args.out, version=args.snapshot,
                             at_lsn=args.at_lsn)
    elif args.cmd == "sync-iceberg":
        from .iceberg import sync_iceberg
        out = sync_iceberg(args.root, args.out, version=args.snapshot)
    elif args.cmd == "export-delta":
        from .export import export_delta
        out = export_delta(args.root, args.out, version=args.snapshot,
                           at_lsn=args.at_lsn)
    elif args.cmd == "sync-delta":
        from .export import sync_delta
        out = sync_delta(args.root, args.out, version=args.snapshot)
    elif args.cmd == "vacuum-delta":
        from .export import vacuum_delta
        out = vacuum_delta(args.out, keep_last=args.keep_last)
    elif args.cmd == "vacuum-iceberg":
        from .iceberg import vacuum_iceberg
        out = vacuum_iceberg(args.out, keep_last=args.keep_last)
    elif args.cmd == "alter":
        from .schema import alter_table, table_schema
        adds = [tuple(a.split(":", 1)) for a in args.add]
        snap = alter_table(args.root, add=adds, drop=args.drop)
        out = {"version": snap.version,
               "columns": table_schema(snap).names}
    elif args.cmd == "status":
        snap = load(args.root)
        out = {"version": snap.version, "max_lsn": snap.max_lsn,
               "fragments": len(snap.fragments), "rows": snap.total_rows,
               "bytes": sum(f.size_bytes for f in snap.fragments)}
    elif args.cmd == "metrics":
        from .metrics import history
        out = {"history": history(args.root)}
    elif args.cmd == "serve":
        from .service import serve
        serve(args.base, port=args.port, host=args.host)  # blocks
    elif args.cmd == "serve-rpc":
        import json as _json
        from .rpc import make_server
        srv = make_server(args.base, args.port, args.host)
        print(_json.dumps({"serving": f"tcp://{args.host}:"
                                      f"{srv.server_address[1]}",
                           "base": args.base}), flush=True)
        srv.serve_forever()  # blocks
        out = {"stopped": True}
    print(json.dumps(out))
    if owns_session:
        ray.shutdown()


if __name__ == "__main__":
    main()
