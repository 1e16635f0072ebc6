"""NIFS: non-interactive folding scheme for relaxed R1CS (Nova's core).

Mirrors the math of nova-snark's NIFS (SURVEY.md §2 D3, §3.4): a running
*relaxed* instance (comm_W, comm_E, X, u) absorbs a fresh plain instance
via one cross-term commitment and one Poseidon-derived 128-bit challenge.

Cross-field hashing: commitments live on Pallas (coords in Fp) while the
primary transcript runs over Fq, so affine coordinates are absorbed as
two sub-128-bit chunks each — an injective, canonical embedding.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Curve, Point
from ..fields import Field, NLIMBS
from ..poseidon import Transcript
from .pedersen import CommitmentKey
from .r1cs_device import DeviceShape


from typing import NamedTuple


class R1CSInstance(NamedTuple):
    """Plain R1CS instance; a pytree (jit-friendly)."""

    comm_w: Point
    x: jnp.ndarray  # (n_io, 17)


class RelaxedInstance(NamedTuple):
    comm_w: Point
    comm_e: Point
    x: jnp.ndarray
    u: jnp.ndarray  # (17,)

    @classmethod
    def default(cls, curve: Curve, field: Field, n_io: int) -> "RelaxedInstance":
        zero = jnp.broadcast_to(field.zero, (n_io, NLIMBS))
        return cls(
            curve.identity(()), curve.identity(()), zero, jnp.asarray(field.zero)
        )


class RelaxedWitness(NamedTuple):
    w: jnp.ndarray  # (n_aux, 17)
    e: jnp.ndarray  # (num_cons, 17)

    @classmethod
    def default(cls, field: Field, n_aux: int, n_cons: int) -> "RelaxedWitness":
        return cls(
            jnp.broadcast_to(field.zero, (n_aux, NLIMBS)),
            jnp.broadcast_to(field.zero, (n_cons, NLIMBS)),
        )


# ---------------------------------------------------------------------
# transcript helpers
# ---------------------------------------------------------------------


def absorb_point(tr: Transcript, field: Field, curve: Curve, p: Point) -> None:
    """Absorb a point canonically: affine coords split into 128-bit
    chunks of the transcript field, plus an identity flag."""
    f_base = curve.field
    zinv = f_base.inv(p.z)
    ax = f_base.from_mont(f_base.mul(p.x, zinv))  # canonical limbs
    ay = f_base.from_mont(f_base.mul(p.y, zinv))
    is_id = curve.is_identity(p)

    def chunks(canon):
        lo = jnp.concatenate([canon[..., :8], jnp.zeros((9,), jnp.uint32)], axis=-1)
        hi = jnp.concatenate([canon[..., 8:], jnp.zeros((8,), jnp.uint32)], axis=-1)
        return lo, hi

    flag = jnp.where(is_id, 1, 0).astype(jnp.uint32).reshape(())
    flag_limbs = jnp.zeros((NLIMBS,), jnp.uint32).at[0].set(flag)
    for limbs in (*chunks(ax), *chunks(ay), flag_limbs):
        # canonical (< 2^144 <= p) integer limbs are valid field elements;
        # convert to Montgomery for absorption.
        tr.absorb(field.to_mont(limbs))


def absorb_scalars(tr: Transcript, arrs) -> None:
    for a in arrs:
        if a.ndim == 1:
            tr.absorb(a)
        else:
            tr.absorb(*[a[k] for k in range(a.shape[0])])


def squeeze_challenge_bits(tr: Transcript, field: Field, n_bits: int = 128):
    """(r_mont, r_bits): the 128-bit challenge as a field scalar and as a
    bit array for point scalar-multiplication."""
    el = tr.squeeze()
    canon = field.from_mont(el)
    keep = jnp.where(jnp.arange(NLIMBS) < n_bits // 16, canon, 0)
    r_mont = field.to_mont(keep)
    limb = keep[jnp.arange(n_bits) // 16]
    bits = ((limb >> (jnp.arange(n_bits) % 16)) & 1).astype(jnp.uint8)
    return r_mont, bits


# ---------------------------------------------------------------------
# folding
# ---------------------------------------------------------------------


@dataclasses.dataclass
class NIFS:
    """Folding context for one (shape, commitment key, curve) triple."""

    field: Field  # circuit field (= curve scalar field)
    curve: Curve
    shape: DeviceShape
    ck: CommitmentKey

    def _point_mul(self, p: Point, bits: jnp.ndarray) -> Point:
        pb = Point(*(v[None] for v in p))
        out = self.curve.scalar_mul_bits(pb, bits[:, None])
        return Point(*(v[0] for v in out))

    def fold_instance(
        self,
        tr: Transcript,
        U1: RelaxedInstance,
        u2: R1CSInstance,
        comm_t: Point,
    ) -> RelaxedInstance:
        """Derive r and fold (verifier-side work; no witnesses)."""
        f, c = self.field, self.curve
        absorb_point(tr, f, c, U1.comm_w)
        absorb_point(tr, f, c, U1.comm_e)
        absorb_scalars(tr, [U1.x, U1.u])
        absorb_point(tr, f, c, u2.comm_w)
        absorb_scalars(tr, [u2.x])
        absorb_point(tr, f, c, comm_t)
        r_mont, r_bits = squeeze_challenge_bits(tr, f)

        rb = jnp.broadcast_to(r_mont, U1.x.shape)
        x = f.partial_reduce(f.add(U1.x, f.mul(rb, u2.x)), k_max=2)
        u = f.partial_reduce(f.add(U1.u, r_mont), k_max=2)
        # One batched scalar-mul covers both r-scaled points (same r).
        both = Point(*(jnp.stack([a, b]) for a, b in zip(u2.comm_w, comm_t)))
        scaled = c.scalar_mul_bits(both, jnp.broadcast_to(r_bits[:, None], (r_bits.shape[0], 2)))
        comm_w = c.add(U1.comm_w, Point(*(v[0] for v in scaled)))
        comm_e = c.add(U1.comm_e, Point(*(v[1] for v in scaled)))
        return RelaxedInstance(comm_w, comm_e, x, u), r_mont

    def prove(
        self,
        tr: Transcript,
        U1: RelaxedInstance,
        W1: RelaxedWitness,
        u2: R1CSInstance,
        w2: jnp.ndarray,
    ):
        """Prover fold: compute + commit the cross term, then fold both
        instance and witness.  Returns (U', W', comm_T)."""
        f = self.field
        one = jnp.asarray(f.one)
        z1 = self.shape.z_vector(f, W1.w, U1.x, U1.u)
        z2 = self.shape.z_vector(f, w2, u2.x, one)
        t = self.shape.cross_term(f, z1, U1.u, z2, one)
        comm_t = self.ck.commit(t)

        (U_new, r_mont) = self.fold_instance(tr, U1, u2, comm_t)

        rw = jnp.broadcast_to(r_mont, w2.shape)
        w = f.partial_reduce(f.add(W1.w, f.mul(rw, w2)), k_max=2)
        rt = jnp.broadcast_to(r_mont, t.shape)
        e = f.partial_reduce(f.add(W1.e, f.mul(rt, t)), k_max=2)
        return U_new, RelaxedWitness(w, e), comm_t
