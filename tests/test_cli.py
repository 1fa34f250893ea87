"""CLI config-override tests (`--set dotted.path=value`).

Mirrors the reference's tyro full-config CLI capability
(/root/reference/main.py:17-24,96): every nested hyperparameter must be
reachable from the command line, including fields of frozen dataclasses.
"""

import pytest

from main import apply_overrides
from gslam_tpu.mapping.backend_ops import MapConfig
from gslam_tpu.runtime.system import SlamConfig
from gslam_tpu.tracking.track import TrackingConfig


def _cfg():
    return SlamConfig(
        tracking=TrackingConfig(),
        mapping=MapConfig(),
        capacity=1024,
        kf_capacity=8,
        synchronous=True,
        run_dir="/tmp/test_cli",
    )


def test_set_frozen_nested_field():
    # the documented example from --help
    cfg = apply_overrides(_cfg(), ["mapping.ssim_weight=0.1"])
    assert cfg.mapping.ssim_weight == 0.1


def test_set_doubly_nested_frozen_field():
    cfg = apply_overrides(_cfg(), ["mapping.render.tile_capacity=64"])
    assert cfg.mapping.render.tile_capacity == 64


def test_set_top_level_and_bool():
    cfg = apply_overrides(
        _cfg(), ["capacity=2048", "mapping.enable_pgo=true",
                 "tracking.use_gt_depths=false"]
    )
    assert cfg.capacity == 2048
    assert cfg.mapping.enable_pgo is True
    assert cfg.tracking.use_gt_depths is False


def test_set_unknown_field_errors():
    with pytest.raises(SystemExit):
        apply_overrides(_cfg(), ["mapping.not_a_field=1"])


def test_set_preserves_other_fields():
    base = _cfg()
    cfg = apply_overrides(base, ["mapping.pose_lr=0.01"])
    assert cfg.mapping.pose_lr == 0.01
    assert cfg.mapping.window_size == MapConfig().window_size
    assert cfg.tracking == TrackingConfig()
