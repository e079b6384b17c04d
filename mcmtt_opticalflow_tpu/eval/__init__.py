from mcmtt_opticalflow_tpu.eval.clearmot import (  # noqa: F401
    ClearMotAccumulator,
    EvaluationResult,
    evaluate_clear_mot,
)
