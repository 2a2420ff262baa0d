"""Train-CLI test/profile modes on a stub dataset (no real DTU needed)."""

import numpy as np
import jax

from effi_mvs_plus_tpu.models import EffiMVSConfig

import __graft_entry__ as graft


class StubDataset:
    """Minimal dataset producing the training-sample contract."""

    def __init__(self, n=2, B_unused=None, H=64, W=96, V=3):
        self.n = n
        self.H, self.W, self.V = H, W, V

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        H, W, V = self.H, self.W, self.V
        imgs, proj_ms, dv = graft._tiny_inputs(1, V, H, W)
        rng = np.random.default_rng(idx)
        scales = {"stage1": 8, "stage2": 4, "stage3": 2, "stage4": 1}
        gt = {k: rng.uniform(430, 930, (H // s, W // s)).astype(np.float32)
              for k, s in scales.items()}
        return {"imgs": imgs[0],
                "proj_matrices": {k: v[0] for k, v in proj_ms.items()},
                "depth_values": dv[0], "depth": gt,
                "mask": {k: np.ones_like(v) for k, v in gt.items()},
                "filename": f"scan1/{idx:08d}"}


def _args(**kw):
    from effi_mvs_plus_tpu.cli.train import build_parser
    argv = ["--mode", "test", "--batch_size", "1", "--num_workers", "1"]
    for k, v in kw.items():
        argv += [f"--{k}", str(v)]
    return build_parser().parse_args(argv)


def test_run_test_mode():
    from effi_mvs_plus_tpu.cli import train as cli
    args = _args()
    m = cli.run_test(args, EffiMVSConfig(), jax.random.PRNGKey(0),
                     StubDataset(n=2))
    assert np.isfinite(m["abs_depth_error"])


def test_run_profile_mode(tmp_path):
    from effi_mvs_plus_tpu.cli import train as cli
    args = _args(logdir=str(tmp_path))
    dt = cli.run_profile(args, EffiMVSConfig(), jax.random.PRNGKey(0),
                         StubDataset(n=1))
    assert dt > 0
    import os
    assert os.path.isdir(os.path.join(str(tmp_path), "trace"))
