"""Persisted per-table configuration (``config.json`` at the table root).

Moonlink analog: the table-config JSON carried next to the table and
merged over engine defaults (``/root/reference/src/moonlink_backend/src/
table_config.rs`` — MooncakeTableConfig/IcebergTableConfig/WAL sections
deserialized with serde defaults so a partial file is valid). Same
contract here: ``config.json`` holds only the overrides; every absent
key falls back to the dataclass default, so upgrading the engine never
invalidates stored configs.

Sections:
- ``compaction``: CompactionConfig fields (victim thresholds, output
  target, PSNR gate) used by compact and both OPTIMIZE modes;
- ``cluster``: curve ("zorder"/"hilbert"), exchange ("spill"/"plasma"),
  fragment_target_bytes, hot_threshold;
- ``follow``: poll_interval / idle_cycles for the live-CDC tail;
- ``expire``: keep_last.

CLI: ``engine config --root T`` prints the effective config;
``--set section.key=value`` persists overrides (atomic publish through
the table filesystem, any backend).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, fields

from .fs import for_root
from .pipelines.compact import CompactionConfig

CONFIG_REL = "config.json"


@dataclass
class IdentityConfig:
    """Row-identity declaration — the analog of moonlink's IdentityProp
    (``/root/reference/src/moonlink/src/row/moonlink_row.rs:270-350``).
    ``mode="keys"`` (default): ``key_columns`` of length 1 =
    SinglePrimitiveKey; length > 1 = the ``Keys(vec)`` composite mode
    (MERGE/dedup key on the canonical joined key, zone-map pruning on
    the first column). ``mode="fullrow"``: no key — the whole row is
    the identity (REPLICA IDENTITY FULL analog, moonlink_row.rs:343-349);
    duplicates allowed, a delete kills exactly one instance;
    ``key_columns`` is ignored."""
    key_columns: list = field(default_factory=lambda: ["image_id"])
    mode: str = "keys"


@dataclass
class ClusterConfig:
    curve: str = "zorder"
    exchange: str = "spill"
    fragment_target_bytes: int = 128 * 1024 * 1024
    hot_threshold: float = 0.001


@dataclass
class FollowConfig:
    poll_interval: float = 1.0
    idle_cycles: int = 3


@dataclass
class ExpireConfig:
    keep_last: int = 2


@dataclass
class ExportConfig:
    """Interop sync targets — the analog of moonlink's per-table
    Iceberg warehouse location (``/root/reference/src/moonlink_backend/
    src/table_config.rs`` IcebergTableConfig). When ``iceberg_dest`` /
    ``delta_dest`` is set, ``create_snapshot`` (RPC) and
    ``engine sync-*`` default their destination to it."""
    iceberg_dest: str = ""
    delta_dest: str = ""


@dataclass
class TableConfig:
    compaction: CompactionConfig = field(default_factory=CompactionConfig)
    cluster: ClusterConfig = field(default_factory=ClusterConfig)
    follow: FollowConfig = field(default_factory=FollowConfig)
    expire: ExpireConfig = field(default_factory=ExpireConfig)
    identity: IdentityConfig = field(default_factory=IdentityConfig)
    export: ExportConfig = field(default_factory=ExportConfig)

    def to_dict(self) -> dict:
        return asdict(self)


_SECTIONS = {"compaction": CompactionConfig, "cluster": ClusterConfig,
             "follow": FollowConfig, "expire": ExpireConfig,
             "identity": IdentityConfig, "export": ExportConfig}


def _merge_section(cls, overrides: dict):
    known = {f.name: f for f in fields(cls)}
    bad = sorted(set(overrides) - set(known))
    if bad:
        raise KeyError(f"unknown {cls.__name__} keys: {bad}")
    return cls(**overrides)


def load_table_config(root: str) -> TableConfig:
    """Effective config: stored overrides merged over defaults."""
    tfs = for_root(root)
    if not tfs.exists(CONFIG_REL):
        return TableConfig()
    stored = tfs.read_json(CONFIG_REL)
    kw = {}
    for name, cls in _SECTIONS.items():
        kw[name] = _merge_section(cls, stored.get(name, {}))
    unknown = sorted(set(stored) - set(_SECTIONS))
    if unknown:
        raise KeyError(f"unknown config sections: {unknown}")
    return TableConfig(**kw)


def set_table_config(root: str, assignments: dict[str, str]) -> TableConfig:
    """Apply ``{"section.key": "value"}`` overrides and persist.

    Values parse as JSON when possible (ints/floats/bools/null), else
    stay strings. Only the overridden keys are stored — defaults are
    never frozen into the file.
    """
    tfs = for_root(root)
    stored = tfs.read_json(CONFIG_REL) if tfs.exists(CONFIG_REL) else {}
    for dotted, raw in assignments.items():
        section, _, key = dotted.partition(".")
        if section not in _SECTIONS or not key:
            raise KeyError(f"expected section.key with section in "
                           f"{sorted(_SECTIONS)}, got {dotted!r}")
        if key not in {f.name for f in fields(_SECTIONS[section])}:
            raise KeyError(f"unknown key {key!r} in section {section!r}")
        try:
            val = json.loads(raw)
        except (json.JSONDecodeError, TypeError):
            val = raw
        stored.setdefault(section, {})[key] = val
    # validate the merged result before publishing
    for name, cls in _SECTIONS.items():
        _merge_section(cls, stored.get(name, {}))
    tfs.write_json_atomic(CONFIG_REL, stored)
    return load_table_config(root)
