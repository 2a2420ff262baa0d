from effi_mvs_plus_tpu.fuse.dypcd import fuse_scene, DypcdParams  # noqa: F401
from effi_mvs_plus_tpu.fuse.ply import write_ply, read_ply  # noqa: F401
