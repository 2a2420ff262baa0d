"""Produce the committed synthetic end-to-end accuracy artifact
(E2E_ACCURACY_r03.json): the REAL inference -> dypcd fusion -> PLY ->
chamfer-eval chain on the exactly-known synthetic plane scene.  Same code
path as tests/test_e2e_accuracy.py (imported from there) — this runner
just pins the JSON at the repo root.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/e2e_accuracy_synth.py
"""

import json
import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main():
    from test_e2e_accuracy import run_accuracy_chain, INITIAL_SPACING_MM

    with tempfile.TemporaryDirectory() as td:
        stats = run_accuracy_chain(td)
    stats["pass"] = bool(stats["overall_mm"] < 2.0
                         and stats["overall_mm"] < 0.2 * INITIAL_SPACING_MM)
    import jax
    stats["backend"] = jax.default_backend()   # tpu run covers the pallas
    # kernels (warp + fused GRU) on-chip; cpu run is the f32-ish oracle
    out = os.path.join(_REPO, sys.argv[1] if len(sys.argv) > 1
                       else "E2E_ACCURACY_r03.json")
    with open(out, "w") as f:
        json.dump(stats, f, indent=1)
    print(json.dumps(stats, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
