from effi_mvs_plus_tpu.fuse.dypcd import (fuse_scene,  # noqa: F401
                                          fuse_scene_device, DypcdParams)
from effi_mvs_plus_tpu.fuse.ply import write_ply, read_ply  # noqa: F401
