from effi_mvs_plus_tpu.data.pfm import read_pfm, save_pfm  # noqa: F401
from effi_mvs_plus_tpu.data.cams import (  # noqa: F401
    read_cam_file, write_cam_file, read_pair_file,
)
from effi_mvs_plus_tpu.data.registry import find_dataset  # noqa: F401
