"""Typed-config profiles wired into every CLI (SURVEY §5.6, VERDICT r1
item #10): each parser's defaults must come from its named profile (the
reference shell presets train.sh:22-26, test_dtu.sh:15-16,
test_tank.sh:14-15), with explicit flags still winning."""

import pytest

from effi_mvs_plus_tpu.cli import test_dtu as td
from effi_mvs_plus_tpu.cli import test_tank as tt
from effi_mvs_plus_tpu.cli import train as tr
from effi_mvs_plus_tpu.config import (PROFILES, TANK_FILTER_CONFIGS,
                                      DypcdParams, get_profile)


def test_dtu_train_profile_matches_train_sh():
    a = tr.build_parser("dtu_train").parse_args(["--trainpath", "x"])
    assert (a.epochs, a.batch_size, a.lr, a.wd) == (16, 16, 1e-3, 1e-3)
    assert (a.trainviews, a.dataset, a.ndepths) == (5, "dtu_yao", "48,8,8")
    assert a.interval_scale == 0.53 and a.numdepth == 384


def test_blend_finetune_profile_matches_train_sh_finetune():
    b = tr.build_parser("blend_finetune").parse_args(["--trainpath", "x"])
    assert (b.epochs, b.batch_size, b.lr) == (10, 8, 4e-4)
    assert (b.trainviews, b.dataset, b.ndepths) == (7, "blend", "96,8,8")


def test_tank_eval_profile_matches_test_tank_sh():
    c = tt.build_parser("tank_eval").parse_args(
        ["--testpath", "x", "--loadckpt", "y"])
    assert (c.ndepths, c.num_view, c.numdepth) == ("96,8,8", 11, 384)


def test_dtu_eval_profile_matches_test_dtu_sh():
    d = td.build_parser("dtu_eval").parse_args(
        ["--testpath", "x", "--testlist", "y", "--loadckpt", "z"])
    assert (d.ndepths, d.num_view) == ("48,8,8", 5)
    assert (d.max_h, d.max_w, d.interval_scale) == (1184, 1600, 0.53)
    assert (d.conf, d.dist_base, d.diff_base) == (0.5, 0.5, 0.25)
    assert d.batch_size == 6      # measured v5e throughput sweet spot


def test_explicit_flags_beat_profile():
    e = tr.build_parser("dtu_train").parse_args(
        ["--trainpath", "x", "--lr", "5e-4", "--batch_size", "4"])
    assert e.lr == 5e-4 and e.batch_size == 4


def test_unknown_profile_exits():
    with pytest.raises(SystemExit):
        get_profile("nope")


def test_tank_filter_configs_cover_both_splits():
    # 8 intermediate + 6 advanced scenes (reference test_tank.py:600-615)
    assert len(TANK_FILTER_CONFIGS) == 14
    assert TANK_FILTER_CONFIGS["Horse"].dist_filter == 4
    assert TANK_FILTER_CONFIGS["Auditorium"].depth_filter == 500
    assert PROFILES["dtu_eval"].fusion == DypcdParams()
