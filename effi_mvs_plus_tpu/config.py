"""One typed configuration tree for the whole framework (SURVEY §5.6).

The reference scatters its configuration across argparse defaults in three
entry scripts, shell-script presets (train.sh:22-26, test_dtu.sh:15-16,
test_tank.sh:14-15), and constants embedded in source (fusion thresholds
test_dtu_dypcd.py:33-38, per-scene T&T dicts test_tank.py:600-615,
architecture dims Effi_MVS_plus.py:337-354).  Here every knob lives in a
frozen dataclass, the shell presets become named PROFILES, and the CLIs
build their defaults from a profile — constants exist exactly once.

Layout:
    EffiMVSConfig   architecture (defined in models/effi_mvs.py, re-exported)
    DataConfig      dataset reader + preprocessing knobs
    TrainConfig     optimizer / schedule / loop knobs
    DypcdParams     DTU dypcd fusion constants
    TankParams      per-scene T&T fusion config (+ TANK_FILTER_CONFIGS)
    RunProfile      one named end-to-end preset binding all of the above
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from effi_mvs_plus_tpu.models.effi_mvs import EffiMVSConfig


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset + preprocessing (reference dataset-reader knobs, SURVEY §2.2)."""
    dataset: str = "dtu_yao"
    nviews: int = 5
    numdepth: int = 384
    interval_scale: float = 0.53
    max_h: int = 1184            # general_eval resize bound (test_dtu.sh)
    max_w: int = 1600
    num_workers: int = 8


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimizer/schedule/loop (reference train.py:431-442,510-511)."""
    epochs: int = 16
    batch_size: int = 16         # GLOBAL batch (reference: 16 over 4 GPUs)
    lr: float = 1e-3
    weight_decay: float = 1e-3
    loss_rate: float = 1.0
    summary_freq: int = 50
    save_freq: int = 1
    seed: int = 1


@dataclasses.dataclass(frozen=True)
class DypcdParams:
    """DTU dypcd fusion constants (reference test_dtu_dypcd.py:33-38,
    77-79): consistency ladder i in [s, e), dist < i*dist_base px,
    depth diff < log10(max(i,1.05))*diff_base mm; photometric mask at
    conf_thresh; high-confidence depths override the fused average."""
    s: int = 1
    e: int = 11
    dist_base: float = 0.5
    diff_base: float = 0.25
    conf_thresh: float = 0.5
    conf_override: float = 0.75


@dataclasses.dataclass(frozen=True)
class TankParams:
    """Per-scene Tanks&Temples filter config (reference
    test_tank.py:600-615 `filter_dict_tank8_test`)."""
    views: int = 11
    dh_view_num: int = 2
    dist_filter: float = 2.0
    depth_filter: float = 6000.0
    prob_threshold: float = 0.5
    relative: bool = False


# Deployed per-scene T&T configs (reference test_tank.py:600-615).
TANK_FILTER_CONFIGS = {
    **{s: TankParams() for s in
       ("Family", "Francis", "Lighthouse", "M60", "Panther", "Playground",
        "Train")},
    "Horse": TankParams(dist_filter=4, prob_threshold=0.3),
    "Auditorium": TankParams(dist_filter=1, depth_filter=500,
                             prob_threshold=0.3),
    **{s: TankParams(dist_filter=1, depth_filter=1600, prob_threshold=0.3)
       for s in ("Ballroom", "Courtroom", "Museum", "Palace", "Temple")},
}


@dataclasses.dataclass(frozen=True)
class RunProfile:
    """A named end-to-end preset — the typed equivalent of one reference
    shell script."""
    name: str
    model: EffiMVSConfig
    data: DataConfig
    train: Optional[TrainConfig] = None
    fusion: Optional[DypcdParams] = None
    lists: Tuple[str, ...] = ()          # repo-shipped scan lists


_DTU_ARCH = EffiMVSConfig()                            # ndepths (48,8,8)
_TANK_ARCH = EffiMVSConfig(ndepths=(96, 8, 8))


PROFILES = {
    # train.sh:22 — DTU training
    "dtu_train": RunProfile(
        name="dtu_train", model=_DTU_ARCH,
        data=DataConfig(dataset="dtu_yao", nviews=5),
        train=TrainConfig(),
        lists=("lists/dtu/train.txt", "lists/dtu/test.txt")),
    # train.sh:25-26 — BlendedMVS finetune (96-hypothesis sweep, 7 views)
    "blend_finetune": RunProfile(
        name="blend_finetune", model=_TANK_ARCH,
        data=DataConfig(dataset="blend", nviews=7),
        train=TrainConfig(epochs=10, batch_size=8, lr=4e-4),
        lists=("lists/bld/training_list.txt",
               "lists/bld/validation_list.txt")),
    # test_dtu.sh:15-16 — DTU evaluation + dypcd fusion
    "dtu_eval": RunProfile(
        name="dtu_eval", model=_DTU_ARCH,
        data=DataConfig(dataset="general_eval", nviews=5),
        fusion=DypcdParams(),
        lists=("lists/dtu/test.txt",)),
    # test_tank.sh:14-15 — Tanks&Temples at 1920x1056, 11 views
    "tank_eval": RunProfile(
        name="tank_eval", model=_TANK_ARCH,
        data=DataConfig(dataset="tank", nviews=11, max_h=1056, max_w=1920),
        fusion=DypcdParams(),
        lists=()),
}


def get_profile(name: str) -> RunProfile:
    try:
        return PROFILES[name]
    except KeyError:
        raise SystemExit(
            f"unknown profile {name!r}; available: {sorted(PROFILES)}")


def apply_profile_defaults(parser, profile: RunProfile):
    """Point an argparse parser's defaults at a profile (CLI flags still
    override)."""
    d = {
        "ndepths": ",".join(str(n) for n in profile.model.ndepths),
        "GRUiters": ",".join(str(n) for n in profile.model.gru_iters),
        "CostNum": profile.model.CostNum,
        "dataset": profile.data.dataset,
        "numdepth": profile.data.numdepth,
        "interval_scale": profile.data.interval_scale,
        "num_workers": profile.data.num_workers,
    }
    if profile.train is not None:
        d.update(epochs=profile.train.epochs,
                 batch_size=profile.train.batch_size,
                 lr=profile.train.lr, wd=profile.train.weight_decay,
                 lossrate=profile.train.loss_rate,
                 trainviews=profile.data.nviews,
                 testviews=profile.data.nviews,
                 summary_freq=profile.train.summary_freq,
                 save_freq=profile.train.save_freq,
                 seed=profile.train.seed)
    else:
        d.update(num_view=profile.data.nviews,
                 max_h=profile.data.max_h, max_w=profile.data.max_w)
    if profile.fusion is not None:
        d.update(conf=profile.fusion.conf_thresh,
                 dist_base=profile.fusion.dist_base,
                 diff_base=profile.fusion.diff_base)
    # only touch options the parser actually defines
    known = {a.dest for a in parser._actions}
    parser.set_defaults(**{k: v for k, v in d.items() if k in known})
