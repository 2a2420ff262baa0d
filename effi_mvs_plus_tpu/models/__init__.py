from effi_mvs_plus_tpu.models.effi_mvs import EffiMVSConfig, forward, init_params  # noqa: F401
