"""Persisted table config: partial overrides merge over defaults,
unknown keys rejected, maintenance jobs pick the stored values up
(moonlink table_config.rs analog — serde-default semantics)."""

import json
import os

import pytest

from moonlink_ray.bootstrap import bootstrap_images_table
from moonlink_ray.table_config import (load_table_config, set_table_config)


class TestTableConfig:
    def test_defaults_when_absent(self, tmp_path):
        root = str(tmp_path / "t")
        os.makedirs(root)
        tc = load_table_config(root)
        assert tc.compaction.small_file_bytes == 32 * 1024 * 1024
        assert tc.cluster.curve == "zorder"

    def test_partial_override_roundtrip(self, tmp_path):
        root = str(tmp_path / "t")
        os.makedirs(root)
        tc = set_table_config(root, {"compaction.small_file_bytes": "1048576",
                                     "cluster.curve": "hilbert"})
        assert tc.compaction.small_file_bytes == 1048576
        assert tc.cluster.curve == "hilbert"
        # only overrides are stored; defaults stay live
        stored = json.load(open(os.path.join(root, "config.json")))
        assert stored == {"compaction": {"small_file_bytes": 1048576},
                          "cluster": {"curve": "hilbert"}}
        assert load_table_config(root).compaction.deleted_ratio == 0.5

    def test_unknown_keys_rejected(self, tmp_path):
        root = str(tmp_path / "t")
        os.makedirs(root)
        with pytest.raises(KeyError):
            set_table_config(root, {"compaction.bogus": "1"})
        with pytest.raises(KeyError):
            set_table_config(root, {"nosection.k": "1"})

    @pytest.mark.usefixtures("ray_session")
    def test_cli_config_drives_optimize(self, tmp_path):
        from moonlink_ray.engine import main
        root = str(tmp_path / "t")
        bootstrap_images_table(root, 120, rows_per_fragment=32)
        main(["config", "--root", root, "--set", "cluster.curve=hilbert",
              "compaction.output_target_bytes=2097152"])
        main(["optimize", "--root", root])
        from moonlink_ray.manifest import load
        job = load(root).job
        assert job["kind"] == "optimize" and job["curve"] == "hilbert"
