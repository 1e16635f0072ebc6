from .vdf import EvalMode, MinRootVDF, State, jit_eval, pallas_vdf, vesta_vdf
from .evaluation import Evaluation

__all__ = [
    "EvalMode",
    "MinRootVDF",
    "State",
    "Evaluation",
    "jit_eval",
    "pallas_vdf",
    "vesta_vdf",
]
