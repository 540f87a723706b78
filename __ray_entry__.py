"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (nor in moonlink_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline at sf0.001: bootstrap the deterministic image
    table, run the production maintenance suite (MERGE -> fused
    OPTIMIZE [compact + Z-order cluster in one rewrite] -> expire),
    return the final snapshot scan as a Dataset."""
    from moonlink_ray.queries import ensure_images_fixture, _fresh_copy, _COMPACT_CFG
    from moonlink_ray.pipelines.merge import merge
    from moonlink_ray.pipelines.optimize import optimize
    from moonlink_ray.pipelines.expire import expire
    from moonlink_ray.sources.scan import scan

    sf_dir = "/root/testdata/sf0.001"
    fix = ensure_images_fixture(sf_dir)
    root = _fresh_copy(fix, "entry")
    merge(root, fix["cdc"])
    optimize(root, cfg=_COMPACT_CFG)
    expire(root, keep_last=2)
    return scan(root)


def queries() -> dict[str, Callable[[str], Any]]:
    from moonlink_ray.queries import queries as _q
    return _q()


def oracle_sql() -> dict[str, str]:
    from moonlink_ray.queries import (ORACLE_SF, ensure_images_fixture,
                                      oracle_sql as _o)
    # the maintenance oracles read /tmp/mlray/<ORACLE_SF>/*.parquet
    # (sf0.01 unless MLRAY_ORACLE_SF overrides): make sure the
    # deterministic fixture exists even if the oracle runs first
    try:
        ensure_images_fixture(f"/root/testdata/{ORACLE_SF}")
    except Exception:
        pass
    return _o()
