from effi_mvs_plus_tpu.eval.dtu import evaluate_scan, aggregate, reduce_pts  # noqa: F401
