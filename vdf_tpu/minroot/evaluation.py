"""Vanilla (non-SNARK) VDF proof objects: eval, verify, append.

Mirrors reference ``Evaluation<V, G>`` (/root/reference/src/minroot.rs:376-439):
an evaluation claim ``{result, t}`` verified by running the fast inverse
direction, and an ``append`` combinator that chains proofs by verifying at
the seam and summing ``t``.  ``append`` is also the framework's
checkpoint/restart primitive (SURVEY.md §5): any prefix proof composes
with a continuation proof.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from .vdf import EvalMode, MinRootVDF, State, jit_eval


@dataclasses.dataclass
class Evaluation:
    """Claim: ``eval(original, t) == result`` for some original state."""

    result: State
    t: int
    field_name: str
    mode: str = EvalMode.LTR_SEQUENTIAL.value

    @classmethod
    def eval(cls, vdf: MinRootVDF, x: State, t: int) -> tuple[list, "Evaluation"]:
        """Run the slow direction; returns (z0, proof) like the reference
        (z0 = [result.x, result.y, result.i], src/minroot.rs:394-408)."""
        result = jit_eval(vdf.field.params.name, vdf.mode.value, t)(x)
        z0 = [result.x, result.y, result.i]
        return z0, cls(result, t, vdf.field.params.name, vdf.mode.value)

    @classmethod
    def eval_with_mode(
        cls, mode: "EvalMode", vdf: MinRootVDF, x: State, t: int
    ) -> "Evaluation":
        """Reference ``eval_with_mode`` (src/minroot.rs:410-418)."""
        from .vdf import EvalMode as _EM, MinRootVDF as _V

        v = _V(vdf.field, _EM(mode))
        return cls.eval(v, x, t)[1]

    def _vdf(self) -> MinRootVDF:
        from ..fields import get_field

        return MinRootVDF(get_field(self.field_name), EvalMode(self.mode))

    def verify(self, original: State) -> bool:
        """Check result == eval(original, t) by inverting (fast direction)."""
        vdf = self._vdf()
        back = jit_eval(self.field_name, self.mode, self.t, inverse=True)(self.result)
        f = vdf.field
        ok = (
            f.eq(back.x, original.x)
            & f.eq(back.y, original.y)
            & f.eq(back.i, original.i)
        )
        return bool(np.all(jax.device_get(ok)))

    def append(self, other: "Evaluation") -> "Evaluation | None":
        """Chain: valid iff ``other`` extends this proof's result.
        Returns the combined proof or None (src/minroot.rs:428-438)."""
        if other.verify(self.result):
            return Evaluation(other.result, self.t + other.t, self.field_name, self.mode)
        return None
