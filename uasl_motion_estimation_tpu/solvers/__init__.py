from .lm import LMConfig, LMResult, StopCondition, lm_solve  # noqa: F401
