from mcmtt_opticalflow_tpu.checkpoint.snapshot import (  # noqa: F401
    save_snapshot,
    load_snapshot,
)
