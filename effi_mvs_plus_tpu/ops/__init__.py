from effi_mvs_plus_tpu.ops.warp import bilinear_gather, homo_warp, warp_correlate  # noqa: F401
from effi_mvs_plus_tpu.ops.resample import resample_depth_axis, resample_volume_at_depths  # noqa: F401
from effi_mvs_plus_tpu.ops.upsample import convex_upsample  # noqa: F401
from effi_mvs_plus_tpu.ops.volume import depth_regression, photometric_confidence  # noqa: F401
