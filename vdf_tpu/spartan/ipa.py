"""Inner-product argument (Bulletproofs-style) over the Pasta curves.

The polynomial-commitment opening for Spartan (nova-snark's
``spartan_with_ipa_pc``, SURVEY.md §2 D3/L5): proves ⟨a, b⟩ = v for a
Pedersen-committed vector ``a`` and public ``b`` in log₂(n) rounds.

Device mapping: round folds are batched field ops and batched
fixed-scalar point multiplications; the verifier's final check is one
size-n MSM with challenge-product coefficients.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Curve, Point
from ..curves.msm import msm_traceable
from ..fields import Field, NLIMBS
from ..poseidon import Transcript
from .sumcheck import _sum_rows
from ..nova.nifs import absorb_point, squeeze_challenge_bits


def _inner(field: Field, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return _sum_rows(field, field.mul(a, b))


def _scale_points(curve: Curve, pts: Point, bits: jnp.ndarray) -> Point:
    """Multiply every point in the batch by the same scalar (bit array)."""
    n = pts.x.shape[0]
    bb = jnp.broadcast_to(bits[:, None], (bits.shape[0], n))
    return curve.scalar_mul_bits(pts, bb)


def _cat(curve: Curve, p: Point, q: Point) -> Point:
    return Point(*(jnp.concatenate([a, b], axis=0) for a, b in zip(p, q)))


class IPAProof(NamedTuple):
    ls: tuple  # per-round L commitments (single points)
    rs: tuple
    a_final: jnp.ndarray  # (17,)


@functools.lru_cache(maxsize=None)
def _ipa_round_lr_fn(field_name: str, curve_name: str, n: int):
    """Jitted: (a, b, g, q) -> (l_pt, r_pt) for the size-n round."""
    import jax

    from ..curves import get_curve
    from ..fields import get_field

    f = get_field(field_name)
    curve = get_curve(curve_name)

    def fn(a, b, g, q):
        half = n // 2
        g_l = Point(*(v[:half] for v in g))
        g_r = Point(*(v[half:] for v in g))
        cl = _inner(f, a[:half], b[half:])
        cr = _inner(f, a[half:], b[:half])
        qb = Point(*(v[None] for v in q))
        l_pt = curve.add(
            msm_traceable(curve, g_r, a[:half]),
            Point(*(v[0] for v in _scale_points(curve, qb, _bits_of(f, cl)))),
        )
        r_pt = curve.add(
            msm_traceable(curve, g_l, a[half:]),
            Point(*(v[0] for v in _scale_points(curve, qb, _bits_of(f, cr)))),
        )
        return l_pt, r_pt

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _ipa_round_fold_fn(field_name: str, curve_name: str, n: int):
    """Jitted: (a, b, g, x) -> folded (a', b', g') at size n -> n/2."""
    import jax

    from ..curves import get_curve
    from ..fields import get_field

    f = get_field(field_name)
    curve = get_curve(curve_name)

    def fn(a, b, g, x_mont):
        half = n // 2
        x_inv = f.inv(x_mont)
        xb = jnp.broadcast_to(x_mont, (half, NLIMBS))
        xib = jnp.broadcast_to(x_inv, (half, NLIMBS))
        a2 = f.partial_reduce(f.add(f.mul(a[:half], xb), f.mul(a[half:], xib)), k_max=2)
        b2 = f.partial_reduce(f.add(f.mul(b[:half], xib), f.mul(b[half:], xb)), k_max=2)
        g_l = Point(*(v[:half] for v in g))
        g_r = Point(*(v[half:] for v in g))
        g2 = curve.add(
            _scale_points(curve, g_l, _bits_of(f, x_inv)),
            _scale_points(curve, g_r, _bits_of(f, x_mont)),
        )
        return a2, b2, g2

    return jax.jit(fn)


def ipa_prove(
    field: Field,
    curve: Curve,
    gens: Point,  # (n,) basis
    q: Point,  # value generator (single point)
    a: jnp.ndarray,  # (n, 17) committed vector
    b: jnp.ndarray,  # (n, 17) public vector
    tr: Transcript,
) -> IPAProof:
    f = field
    n = a.shape[0]
    assert n & (n - 1) == 0, "IPA needs power-of-two length"
    ls, rs = [], []
    g = Point(*(v[:n] for v in gens))
    while n > 1:
        l_pt, r_pt = _ipa_round_lr_fn(f.params.name, curve.params.name, n)(a, b, g, q)
        absorb_point(tr, f, curve, l_pt)
        absorb_point(tr, f, curve, r_pt)
        ls.append(l_pt)
        rs.append(r_pt)
        x_mont, _ = squeeze_challenge_bits(tr, f)
        a, b, g = _ipa_round_fold_fn(f.params.name, curve.params.name, n)(
            a, b, g, x_mont
        )
        n //= 2
    return IPAProof(tuple(ls), tuple(rs), a[0])


def _bits_of(field: Field, el_mont: jnp.ndarray, n_bits: int = 255) -> jnp.ndarray:
    canon = field.from_mont(el_mont)
    limb = canon[..., jnp.arange(n_bits) // 16]
    return ((limb >> (jnp.arange(n_bits) % 16)) & 1).astype(jnp.uint8)


def _bits_of_mont(field: Field, el_mont: jnp.ndarray) -> jnp.ndarray:
    return _bits_of(field, el_mont)


def ipa_verify(
    field: Field,
    curve: Curve,
    gens: Point,
    q: Point,
    comm: Point,  # Pedersen commitment to a (over gens[:n])
    b: jnp.ndarray,  # (n, 17) public vector
    value: jnp.ndarray,  # claimed ⟨a, b⟩, (17,)
    proof: IPAProof,
    tr: Transcript,
) -> jnp.ndarray:
    """Returns a device bool (traceable)."""
    f = field
    n = b.shape[0]
    rounds = len(proof.ls)
    assert n == 1 << rounds

    # Replay challenges (transcript work stays eager; field ops are
    # shape-cached jits).
    xs = []
    for l_pt, r_pt in zip(proof.ls, proof.rs):
        absorb_point(tr, f, curve, l_pt)
        absorb_point(tr, f, curve, r_pt)
        x_mont, _ = squeeze_challenge_bits(tr, f)
        xs.append(x_mont)

    ls = Point(*(jnp.stack([getattr(p, k) for p in proof.ls]) for k in ("x", "y", "z")))
    rs = Point(*(jnp.stack([getattr(p, k) for p in proof.rs]) for k in ("x", "y", "z")))
    return _ipa_final_fn(f.params.name, curve.params.name, n, rounds)(
        Point(*(v[:n] for v in gens)), q, comm, b, value, proof.a_final,
        ls, rs, jnp.stack(xs),
    )


@functools.lru_cache(maxsize=None)
def _ipa_final_fn(field_name: str, curve_name: str, n: int, rounds: int):
    """Jitted final IPA check: one size-n MSM + scalar muls."""
    import jax

    from ..curves import get_curve
    from ..fields import get_field

    f = get_field(field_name)
    curve = get_curve(curve_name)

    def fn(g_n, q, comm, b, value, a_final, ls, rs, xs_arr):
        xs = [xs_arr[j] for j in range(rounds)]
        xinvs = [f.inv(x) for x in xs]

        # s_i = prod_j x_j^{±1}; +1 iff bit j (from the top) of i is set.
        # Round j splits the then-current vector, so challenge j governs
        # index bit (rounds-1-j) — build in REVERSE order to put x_0 on top.
        s = f.one[None, :]
        for x, xi in zip(reversed(xs), reversed(xinvs)):
            lo = f.mul(s, jnp.broadcast_to(xi, s.shape))
            hi = f.mul(s, jnp.broadcast_to(x, s.shape))
            s = jnp.concatenate([lo, hi], axis=0)

        g_final = msm_traceable(curve, g_n, s)
        b_final = _inner(f, s, b)

        # P' = comm + v*Q + Σ (x_j^2 L_j + x_j^{-2} R_j)
        p_acc = curve.add(
            Point(*(v[None] for v in comm)),
            _scale_points(curve, Point(*(v[None] for v in q)), _bits_of(f, value)),
        )
        for j in range(rounds):
            x2 = f.sqr(xs[j])
            xi2 = f.sqr(xinvs[j])
            l_j = Point(*(v[j : j + 1] for v in ls))
            r_j = Point(*(v[j : j + 1] for v in rs))
            p_acc = curve.add(p_acc, _scale_points(curve, l_j, _bits_of(f, x2)))
            p_acc = curve.add(p_acc, _scale_points(curve, r_j, _bits_of(f, xi2)))

        lhs1 = _scale_points(
            curve, Point(*(v[None] for v in g_final)), _bits_of(f, a_final)
        )
        ab = f.mul(a_final, b_final)
        lhs2 = _scale_points(curve, Point(*(v[None] for v in q)), _bits_of(f, ab))
        expect = curve.add(lhs1, lhs2)
        return jnp.all(
            curve.eq(Point(*(v[0] for v in expect)), Point(*(v[0] for v in p_acc)))
        )

    return jax.jit(fn)
