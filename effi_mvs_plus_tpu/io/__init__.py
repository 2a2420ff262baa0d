from effi_mvs_plus_tpu.io.torch_import import (  # noqa: F401
    import_state_dict, load_torch_checkpoint, load_npz_checkpoint,
)
