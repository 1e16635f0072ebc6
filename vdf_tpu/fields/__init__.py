from .params import FP, FQ, NLIMBS, LIMB_BITS, FieldParams, int_to_limbs, limbs_to_int
from .ops import Field, get_field, resolve
from .chains import pow_fixed, get_program, program_cost

__all__ = [
    "FP",
    "FQ",
    "NLIMBS",
    "LIMB_BITS",
    "FieldParams",
    "Field",
    "get_field",
    "resolve",
    "pow_fixed",
    "get_program",
    "program_cost",
    "int_to_limbs",
    "limbs_to_int",
]
