"""Test configuration: CPU backend with 8 virtual devices so multi-chip
sharding tests run without TPU hardware, repo root on sys.path."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var above is snapshotted too late — force the platform through the
# live config as well (valid until the backend is first used).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, (
    "virtual 8-device CPU mesh missing; XLA_FLAGS set too late")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_DIR = "/root/reference"


def reference_available():
    return os.path.isdir(REFERENCE_DIR)


def load_reference_models():
    """Import the reference `models` package with its unavailable deps
    stubbed (its utils.py pulls torchvision, which this image lacks).

    Returns a namespace with ``.module`` and ``.Effi_MVS_plus`` bound to the
    sub*modules* (the package __init__ shadows `Effi_MVS_plus` with the
    class) and ``.Effi_MVS_plus_cls`` to the model class."""
    import types
    if "torchvision" not in sys.modules:  # reference data_io pulls it in
        tv = types.ModuleType("torchvision")
        tf = types.ModuleType("torchvision.transforms")
        tf.Compose = lambda *a, **k: None
        tf.ToTensor = lambda *a, **k: None
        tf.Normalize = lambda *a, **k: None
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    if "models" not in sys.modules:
        stub = types.ModuleType("utils")
        stub.local_pcd = lambda *a, **k: None
        sys.modules.setdefault("utils", stub)
        if REFERENCE_DIR not in sys.path:
            sys.path.insert(0, REFERENCE_DIR)
        import models  # noqa: F401
    return types.SimpleNamespace(
        module=sys.modules["models.module"],
        Effi_MVS_plus=sys.modules["models.Effi_MVS_plus"],
        Effi_MVS_plus_cls=sys.modules["models"].Effi_MVS_plus,
    )
