"""Recursive VDF proving via NIFS folding (Nova RecursiveSNARK surface).

API mirrors the reference (/root/reference/src/nova/proof.rs:232-392):
``public_params(t)``, ``eval_and_make_circuits``, ``prove_recursively``,
``verify``, with the same segment-reversal convention (circuits walk the
inverse direction from the final result back to the initial state).

Proof structure this round: the prover folds every per-segment step
instance into one running relaxed R1CS instance (all device math:
witness synthesis, Pedersen MSM commits, cross-term matvecs).  The
verifier replays the Poseidon transcript to re-derive every fold
challenge, checks public-IO chaining across segments, and checks the
final folded relaxed instance directly against its witness.  This is
sound by Nova's folding theorem; wrapping the per-step fold check into
the augmented circuit (for O(1) verification) and Spartan compression
of the final witness check are the staged next layers.
"""

from __future__ import annotations

import dataclasses
import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import get_curve
from ..fields import Field, NLIMBS, get_field
from ..minroot import Evaluation, MinRootVDF, State
from ..poseidon import Transcript
from .circuit import InverseMinRootCircuit
from .nifs import NIFS, R1CSInstance, RelaxedInstance, RelaxedWitness
from .pedersen import commitment_key
from .r1cs_device import DeviceShape


@dataclasses.dataclass
class PublicParams:
    t: int  # iterations per step
    field: Field
    curve_name: str
    dev_shape: DeviceShape
    digest: jnp.ndarray  # transcript domain separator (field element)

    @property
    def nifs(self) -> NIFS:
        n = max(self.dev_shape.shape.num_aux, self.dev_shape.shape.num_cons)
        ck = commitment_key(self.curve_name, n)
        return NIFS(self.field, get_curve(self.curve_name), self.dev_shape, ck)


def _shape_digest(field: Field, shape) -> jnp.ndarray:
    h = hashlib.sha256()
    for coo in (shape.a_coo, shape.b_coo, shape.c_coo):
        h.update(np.asarray(coo[0]).tobytes())
        h.update(np.asarray(coo[1]).tobytes())
        for c in coo[2]:
            h.update(int(c).to_bytes(32, "little"))
    h.update(bytes([shape.num_cons & 0xFF, shape.num_aux & 0xFF]))
    return field.encode(int.from_bytes(h.digest(), "little") % field.params.modulus)


def public_params(num_iters_per_step: int, field_name: str = "Fq") -> PublicParams:
    """Setup: synthesize the step-circuit shape once, build commitment
    generators (reference public_params, proof.rs:232-237)."""
    field = get_field(field_name)
    circuit = InverseMinRootCircuit(num_iters_per_step)
    shape = circuit.shape(field.params.modulus).shape()
    dev = DeviceShape.build(field, shape)
    curve_name = "pallas" if field_name == "Fq" else "vesta"
    return PublicParams(
        num_iters_per_step, field, curve_name, dev, _shape_digest(field, shape)
    )


def eval_and_make_circuits(
    vdf: MinRootVDF, num_iters_per_step: int, num_steps: int, initial_state: State
):
    """Run the slow VDF for n segments; emit circuits in reverse order
    (reference proof.rs:262-298).  Returns (z0, circuits)."""
    assert num_steps > 0
    t = num_iters_per_step
    states = [initial_state]
    s = initial_state
    for _ in range(num_steps):
        _, proof = Evaluation.eval(vdf, s, t)
        s = proof.result
        states.append(s)
    z0 = [s.x, s.y, s.i]  # final result state: circuits walk backward
    circuits = []
    for k in range(num_steps - 1, -1, -1):
        circuits.append(
            InverseMinRootCircuit(
                t, result=states[k + 1], input=states[k]
            )
        )
    return z0, circuits


@dataclasses.dataclass
class RecursiveSNARK:
    """Folded proof: per-step instances + final relaxed accumulator."""

    step_instances: list  # [R1CSInstance] in fold order
    U: RelaxedInstance
    W: RelaxedWitness  # final witness (compressed away by Spartan later)


@dataclasses.dataclass
class NovaVDFProof:
    """Recursive(…) | Compressed(…) surface like the reference enum."""

    snark: RecursiveSNARK
    comm_ts: list  # cross-term commitments, one per fold

    @classmethod
    def prove_recursively(cls, pp: PublicParams, circuits: list, z0: list):
        f = pp.field
        nifs = pp.nifs
        tr = Transcript(f.params.name)
        tr.absorb(pp.digest)
        n_io = pp.dev_shape.shape.num_inputs
        U = RelaxedInstance.default(nifs.curve, f, n_io)
        W = RelaxedWitness.default(
            f, pp.dev_shape.shape.num_aux, pp.dev_shape.shape.num_cons
        )
        instances, comm_ts = [], []
        for circ in circuits:
            z_in = [circ.result.x, circ.result.y, circ.result.i]
            cs, outs = circ.witness(f, z_in)
            w_vec = cs.witness()
            x_vec = jnp.stack(z_in + outs)
            comm_w = nifs.ck.commit(w_vec)
            u2 = R1CSInstance(comm_w, x_vec)
            U, W, comm_t = nifs.prove(tr, U, W, u2, w_vec)
            instances.append(u2)
            comm_ts.append(comm_t)
        return cls(RecursiveSNARK(instances, U, W), comm_ts)

    def verify(self, pp: PublicParams, num_steps: int, z0: list, zi: list) -> bool:
        """Replay transcript, refold instances, check chaining + final
        relaxed satisfaction + commitment openings
        (reference verify, proof.rs:370-387)."""
        f = pp.field
        nifs = pp.nifs
        snark = self.snark
        if len(snark.step_instances) != num_steps or num_steps == 0:
            return False

        # 1. public-IO chaining: first z_in == z0; z_out_k == z_in_{k+1};
        #    last z_out == zi.
        def eq_state(a, b) -> bool:
            return bool(
                np.all(jax.device_get(f.eq(jnp.stack(list(a)), jnp.stack(list(b)))))
            )

        first = snark.step_instances[0].x
        if not eq_state([first[0], first[1], first[2]], z0):
            return False
        for k in range(num_steps - 1):
            xk = snark.step_instances[k].x
            xn = snark.step_instances[k + 1].x
            if not eq_state([xk[3], xk[4], xk[5]], [xn[0], xn[1], xn[2]]):
                return False
        last = snark.step_instances[-1].x
        if not eq_state([last[3], last[4], last[5]], zi):
            return False

        # 2. transcript replay + instance-side refold.
        tr = Transcript(f.params.name)
        tr.absorb(pp.digest)
        n_io = pp.dev_shape.shape.num_inputs
        U = RelaxedInstance.default(nifs.curve, f, n_io)
        for u2, comm_t in zip(snark.step_instances, self.comm_ts):
            U, _ = nifs.fold_instance(tr, U, u2, comm_t)

        c = nifs.curve
        same = (
            bool(np.all(jax.device_get(c.eq(U.comm_w, snark.U.comm_w))))
            and bool(np.all(jax.device_get(c.eq(U.comm_e, snark.U.comm_e))))
            and bool(np.all(jax.device_get(f.eq(U.x, snark.U.x))))
            and bool(np.all(jax.device_get(f.eq(U.u, snark.U.u))))
        )
        if not same:
            return False

        # 3. final relaxed satisfaction + openings.
        if not pp.dev_shape.check_relaxed(f, snark.W.w, snark.W.e, U.x, U.u):
            return False
        if not bool(np.all(jax.device_get(c.eq(nifs.ck.commit(snark.W.w), U.comm_w)))):
            return False
        if not bool(np.all(jax.device_get(c.eq(nifs.ck.commit(snark.W.e), U.comm_e)))):
            return False
        return True
