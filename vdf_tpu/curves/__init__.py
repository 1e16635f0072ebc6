from .point import (
    PALLAS,
    VESTA,
    Curve,
    CurveParams,
    Point,
    get_curve,
    hash_to_curve_ints,
    sqrt_mod,
)
from .msm import msm, msm_traceable

__all__ = [
    "PALLAS",
    "VESTA",
    "Curve",
    "CurveParams",
    "Point",
    "get_curve",
    "hash_to_curve_ints",
    "sqrt_mod",
    "msm",
    "msm_traceable",
]
