from tpumix.eval.evaluator import LoudnessEvaluator  # noqa: F401
