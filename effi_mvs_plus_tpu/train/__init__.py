from effi_mvs_plus_tpu.train.loss import mvs_loss, PRED_STAGE_MAP  # noqa: F401
