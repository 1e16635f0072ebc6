"""Witness-generation constraint system (device-valued synthesis pass).

The same circuit code that built the shape runs again with concrete
values: allocations evaluate their value closures on jnp limb arrays
(batched over lanes), producing the witness vector W as a stacked device
array.  Because everything is pure jnp, a whole circuit's witness
generation jits into one device program.

``check=True`` additionally verifies each enforced constraint against
the values (TestConstraintSystem behavior, reference
/root/reference/src/nova/proof.rs:319-340).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..fields import Field
from .cs import ONE, LinearCombination, Variable


class WitnessCS:
    """Value-carrying pass.  Must allocate in the same order as ShapeCS."""

    def __init__(self, field: Field, inputs: list[jnp.ndarray], check: bool = False):
        self.field = field
        self.aux: list[jnp.ndarray] = []
        self.inputs: list[jnp.ndarray] = list(inputs)  # X values (no ONE)
        self.check = check
        self.failed: list[str] = []
        self._ns: list[str] = []

    class _Namespace:
        def __init__(self, cs, name):
            self.cs, self.name = cs, name

        def __enter__(self):
            self.cs._ns.append(self.name)
            return self.cs

        def __exit__(self, *a):
            self.cs._ns.pop()

    def namespace(self, name: str):
        return self._Namespace(self, name)

    def value_of(self, var: Variable) -> jnp.ndarray:
        if var.kind == "aux":
            return self.aux[var.index]
        if var.index == 0:
            return jnp.broadcast_to(self.field.one, self.aux[0].shape if self.aux else self.inputs[0].shape)
        return self.inputs[var.index - 1]

    def alloc(self, name: str = "aux", value=None) -> Variable:
        assert value is not None, "witness pass requires a value"
        v = Variable("aux", len(self.aux))
        self.aux.append(value)
        return v

    def alloc_input(self, name: str = "input", value=None) -> Variable:
        raise NotImplementedError("inputs are provided up front in witness mode")

    def eval_lc(self, lc: LinearCombination) -> jnp.ndarray:
        f = self.field
        acc = None
        for var, coeff in lc.terms.items():
            coeff = coeff % f.params.modulus
            if coeff == 0:
                continue
            val = self.value_of(var)
            if coeff != 1:
                val = f.mul(val, jnp.broadcast_to(f.encode(coeff), val.shape))
            acc = val if acc is None else f.add(acc, val)
        if acc is None:
            shape = self.aux[0].shape if self.aux else self.inputs[0].shape
            return jnp.broadcast_to(self.field.zero, shape)
        return self.field.partial_reduce(acc, k_max=4)

    def enforce(self, a, b, c, name: str = "") -> None:
        if not self.check:
            return
        f = self.field
        lhs = f.mul(self.eval_lc(a), self.eval_lc(b))
        rhs = self.eval_lc(c)
        import numpy as np

        if not bool(np.all(np.asarray(f.eq(lhs, rhs)))):
            self.failed.append("/".join(self._ns + [name]))

    def witness(self) -> jnp.ndarray:
        """Stacked W: (num_aux, ..., 17)."""
        return jnp.stack(self.aux)
