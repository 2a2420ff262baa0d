from effi_mvs_plus_tpu.utils.profiling import (  # noqa: F401
    Timer, fence, profile_trace,
)
