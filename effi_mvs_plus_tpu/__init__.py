"""effi_mvs_plus_tpu — a TPU-native multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Effi-MVS+ ("Efficient Multi-view Stereo by Dynamic Cost Volume and
Cross-scale Propagation", TCSVT; reference implementation
bdwsq1996/Effi-MVS-plus): cascaded coarse-to-fine depth estimation from
calibrated multi-view images, with a dynamic cost volume, cross-scale
cost propagation, RAFT-style ConvGRU refinement, point-cloud fusion and
DTU/Tanks&Temples evaluation — built TPU-first (static shapes, scans,
device-mesh sharding, bf16 compute) rather than as a port.
"""

__version__ = "0.1.0"

from effi_mvs_plus_tpu.models.effi_mvs import EffiMVSConfig, forward  # noqa: F401
