"""The inverse-MinRoot step circuit (Nova StepCircuit equivalent).

Mirrors the reference circuit semantics exactly
(/root/reference/src/nova/proof.rs:58-230): arity 3 (z = [x, y, i]); each
of the t in-circuit rounds runs the VDF *inverse* direction with 3
constraints and 3 allocations:

    new_i = i - 1                  (linear only — lives in a Num)
    new_x = y - new_i              (allocation, constrained via round eq)
    tmp1  = x^2                    (1 constraint)
    tmp2  = tmp1^2                 (1 constraint)
    new_y = tmp2*x - new_x         (allocation)
    enforce tmp2 * x = new_y + y - i + 1   (1 constraint)

plus one final allocation binding final_i
(/root/reference/src/nova/proof.rs:122-133).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..fields import Field
from ..r1cs.cs import LinearCombination, ONE, ShapeCS
from ..r1cs.gadgets import AllocatedNum, Num, _is_witness
from ..r1cs.witness import WitnessCS


def inverse_round_gadget(cs, i_num: Num, x: AllocatedNum, y: AllocatedNum):
    """One in-circuit inverse MinRoot round (3 constraints)."""
    new_i = i_num.add_constant(cs, -1)

    if _is_witness(cs):
        f = cs.field
        new_x_val = f.sub(y.value, new_i.value)
        new_x = AllocatedNum(cs.alloc("new_x", value=new_x_val), new_x_val)
    else:
        new_x = AllocatedNum(cs.alloc("new_x"))

    tmp1 = x.square(cs, "tmp1")
    tmp2 = tmp1.square(cs, "tmp2")

    if _is_witness(cs):
        f = cs.field
        new_y_val = f.sub(f.mul(tmp2.value, x.value), new_x.value)
        new_y = AllocatedNum(cs.alloc("new_y", value=new_y_val), new_y_val)
    else:
        new_y = AllocatedNum(cs.alloc("new_y"))

    # tmp2 * x = new_y + y - i + 1   (implies new_x = y - new_i as well,
    # given new_y's definition; identical to the reference's single
    # round-closing constraint, /root/reference/src/nova/proof.rs:219-227)
    cs.enforce(
        tmp2.lc(),
        x.lc(),
        new_y.lc() + y.lc() - i_num.lc() + LinearCombination.of(ONE, 1),
        name="round",
    )
    return new_i, new_x, new_y


@dataclasses.dataclass
class InverseMinRootCircuit:
    """Step circuit: t inverse rounds, arity 3.

    ``result``/``input`` States are carried for witness generation (the
    circuit consumes the segment *result* and walks back to its input),
    mirroring /root/reference/src/nova/proof.rs:58-77.
    """

    t: int
    inverse_exponent: int = 5
    result: object | None = None  # State (segment output) — witness only
    input: object | None = None  # State (segment input) — witness only

    def arity(self) -> int:
        return 3

    def synthesize(self, cs, z: list[AllocatedNum]) -> list[AllocatedNum]:
        assert len(z) == 3
        x, y = z[0], z[1]
        i_num = Num.from_alloc(z[2])

        for j in range(self.t):
            with cs.namespace(f"inverse_round_{j}"):
                i_num, x, y = inverse_round_gadget(cs, i_num, x, y)

        # Bind the final i into its own allocation (the step output must
        # be an AllocatedNum, not a bare LC).
        if _is_witness(cs):
            final_i = AllocatedNum(cs.alloc("final_i", value=i_num.value), i_num.value)
        else:
            final_i = AllocatedNum(cs.alloc("final_i"))
        cs.enforce(
            final_i.lc(),
            LinearCombination.of(ONE, 1),
            i_num.lc(),
            name="final_i matches final_i_num",
        )
        return [x, y, final_i]

    # -- host conveniences ---------------------------------------------

    def shape(self, modulus: int) -> "ShapeCS":
        cs = ShapeCS(modulus)
        z = [AllocatedNum.alloc_input(cs, n) for n in ("z_x", "z_y", "z_i")]
        outs = self.synthesize(cs, z)
        # Step outputs become public IO as well (standalone mode; under
        # Nova's augmented circuit the folding verifier consumes them).
        for k, o in enumerate(outs):
            cs.enforce(
                o.lc(),
                LinearCombination.of(ONE, 1),
                LinearCombination.of(cs.alloc_input(f"out_{k}"), 1),
                name=f"bind_out_{k}",
            )
        return cs

    def witness(self, field: Field, z_values: list[jnp.ndarray], check: bool = False):
        """Generate (W, outputs) for batched z values (each (..., 17))."""
        cs = WitnessCS(field, inputs=list(z_values), check=check)
        z = [AllocatedNum(v, val) for v, val in zip(self._input_vars(), z_values)]
        outs = self.synthesize(cs, z)
        return cs, [o.value for o in outs]

    @staticmethod
    def _input_vars():
        from ..r1cs.cs import Variable

        return [Variable("input", k + 1) for k in range(3)]
