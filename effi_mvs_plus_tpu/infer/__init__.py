from effi_mvs_plus_tpu.infer.engine import InferenceEngine  # noqa: F401
