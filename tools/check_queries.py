"""Local mimic of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + schema + order-insensitive value hash).

Usage: python tools/check_queries.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    # Mimic the driver's canonicalizer EXACTLY: sort_values over raw
    # object columns. Deliberately NO bytes->hex rescue — a query that
    # returns a binary column must crash here, because it crashes in
    # the driver (round-1 lesson: a local-only rescue masked four
    # driver 'unhashable bytearray' errors).
    df = df[sorted(df.columns)].copy()
    df = df.astype({c: "object" for c in df.columns})
    return df.sort_values(list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(norm(df).astype(str), index=False).sum())


def _reap_scratch(base_dir: str) -> float:
    """Delete per-query scratch (the hardlinked table copies + export
    dests) so a bench-scale run doesn't accumulate ~10 GB of tmpfs per
    maintenance query (one full suite at sf0.1 left 91 GB behind and
    OOM'd the raylet). Cached inputs survive: the pristine ``table``
    root, the parquet dumps, and ``follow-incoming`` — everything else
    under the fixture dir is rebuilt by whichever query needs it.
    Returns GB freed. Opt out with MLRAY_KEEP_SCRATCH=1."""
    import shutil
    # cached INDEX builds (ivf_index, gram_index) also survive: they are
    # inputs, deterministic per scale, and expensive to rebuild per query
    keep = {"table", "follow-incoming", "ivf_index", "gram_index"}
    freed = 0
    if not os.path.isdir(base_dir):
        return 0.0
    for name in os.listdir(base_dir):
        p = os.path.join(base_dir, name)
        if name in keep or not os.path.isdir(p):
            continue
        freed += sum(os.lstat(os.path.join(dp, f)).st_size
                     for dp, _, fs in os.walk(p) for f in fs)
        shutil.rmtree(p, ignore_errors=True)
    return freed / 1e9


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # pin the static oracle-SQL fixture paths to the scale under test
    # BEFORE the queries module is imported
    os.environ.setdefault("MLRAY_ORACLE_SF", os.path.basename(
        os.path.normpath(sf_dir)))

    import ray
    ray.init(address="local",
             num_cpus=int(os.environ.get("MLRAY_CHECK_CPUS", "8")),
             include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    from moonlink_ray.queries import DATA_ROOT
    scratch_base = os.path.join(
        DATA_ROOT, os.path.basename(os.path.normpath(sf_dir)))
    reap = os.environ.get("MLRAY_KEEP_SCRATCH") != "1"

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:24s} query raised: {type(e).__name__}: {e}")
            continue
        finally:
            if reap:
                _reap_scratch(scratch_base)
        dt = time.time() - t0
        if name not in oracles:
            print(f"ok-   {name:24s} rows={len(got):6d} (rows-only) {dt:5.1f}s")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name:24s} oracle raised: {e}")
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} != {len(want)}")
        if sorted(map(str.lower, got.columns)) != sorted(map(str.lower, want.columns)):
            problems.append(f"schema {sorted(got.columns)} != {sorted(want.columns)}")
        if not problems:
            got.columns = [c.lower() for c in got.columns]
            want.columns = [c.lower() for c in want.columns]
            if value_hash(got) != value_hash(want):
                problems.append("value hash mismatch")
                a, b = norm(got), norm(want)
                neq = (a.astype(str) != b.astype(str)).any(axis=1)
                print(a[neq].head(3))
                print(b[neq].head(3))
        if problems:
            failures.append(name)
            print(f"FAIL  {name:24s} {'; '.join(problems)}")
        else:
            print(f"PASS  {name:24s} rows={len(got):6d} {dt:5.1f}s")

    print(f"\n{len(failures)} failures: {failures}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
