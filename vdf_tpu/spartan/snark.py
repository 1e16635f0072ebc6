"""Spartan SNARK for relaxed R1CS (nova's spartan_with_ipa_pc tier).

Proves knowledge of (W, E) for a relaxed instance (comm_W, comm_E, X, u)
— used by CompressedSNARK to replace the final witness transmission
(reference L5, /root/reference/src/nova/proof.rs:360-368).

Protocol (standard Spartan, relaxed form):
  1. sumcheck #1 over constraint rows:
         0 = Σ_x eq(τ, x)·(Az(x)·Bz(x) − u·Cz(x) − E(x))
     → point r_x, claims vA, vB, vC, vE.
  2. batch with γ; sumcheck #2 over columns:
         vA + γ·vB + γ²·vC = Σ_y M_γ(r_x, y)·z(y)
     → point r_y; the verifier evaluates M_γ(r_x, r_y) itself from the
     sparse matrices, and z(r_y) splits into a committed W part (IPA
     opening) plus the public (u, X) part.
  3. IPA openings: E at eq(r_x), W at eq(r_y)-restriction.

All prover math is batched field ops / MSMs on device.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..curves import Point, get_curve
from ..fields import Field, NLIMBS
from ..fields.ops import resolve
from ..nova.nifs import RelaxedInstance, RelaxedWitness, absorb_point, absorb_scalars
from ..nova.pedersen import commitment_key
from ..poseidon import Transcript
from .ipa import IPAProof, ipa_prove, ipa_verify
from .multilinear import eq_table, evaluate, num_vars, pad_to_pow2
from .sumcheck import _sum_rows, sumcheck_prove, sumcheck_verify


from typing import NamedTuple


class SpartanProof(NamedTuple):
    sc1_messages: tuple
    vA: jnp.ndarray
    vB: jnp.ndarray
    vC: jnp.ndarray
    vE: jnp.ndarray
    sc2_messages: tuple
    vW: jnp.ndarray
    ipa_e: IPAProof
    ipa_w: IPAProof


def _absorb_instance(tr: Transcript, field: Field, curve, U: RelaxedInstance):
    absorb_point(tr, field, curve, U.comm_w)
    absorb_point(tr, field, curve, U.comm_e)
    absorb_scalars(tr, [U.x, U.u])


def _matvec_padded(field, mat, z, n_pad):
    out = mat.matvec(field, z)
    pad = jnp.broadcast_to(field.zero, (n_pad - out.shape[0], NLIMBS))
    return jnp.concatenate([out, pad], axis=0)


def _gamma_matrix_vector(field: Field, shape, eq_rx: jnp.ndarray, gamma, n_cols_pad):
    """m(y) = Σ_rows (A + γB + γ²C)[row, y] · eq_rx[row], scattered by col."""
    f = field
    g2 = f.mul(gamma, gamma)
    out = jnp.zeros((n_cols_pad, NLIMBS), jnp.uint32)
    acc = None
    for coo_dev, weight in ((shape.a, None), (shape.b, gamma), (shape.c, g2)):
        vals = coo_dev.vals
        if vals.shape[0] == 0:
            continue
        w = f.mul(vals, eq_rx[coo_dev.rows])
        if weight is not None:
            w = f.mul(w, jnp.broadcast_to(weight, w.shape))
        part = jax.ops.segment_sum(w, coo_dev.cols, num_segments=n_cols_pad)
        acc = part if acc is None else acc + part
    return f.partial_reduce(resolve(acc, NLIMBS), k_max=15)


def _eval_gamma_matrix(field: Field, shape, eq_rx, eq_ry, gamma):
    """M_γ(r_x, r_y) = Σ entries v·eq_rx[row]·eq_ry[col]·γ^k (direct)."""
    f = field
    g2 = f.mul(gamma, gamma)
    total = None
    for coo_dev, weight in ((shape.a, None), (shape.b, gamma), (shape.c, g2)):
        if coo_dev.vals.shape[0] == 0:
            continue
        w = f.mul(coo_dev.vals, f.mul(eq_rx[coo_dev.rows], eq_ry[coo_dev.cols]))
        s = _sum_rows(f, w)
        if weight is not None:
            s = f.mul(s, weight)
        total = s if total is None else f.partial_reduce(f.add(total, s), k_max=2)
    return total


def _eq_point(field: Field, a: list, b: list):
    """eq(a, b) = Π (a_j b_j + (1-a_j)(1-b_j)) for two points."""
    f = field
    out = None
    one = f.one
    for x, y in zip(a, b):
        term = f.mul(x, y)
        term2 = f.mul(f.sub(one, x), f.sub(one, y))
        v = f.partial_reduce(f.add(term, term2), k_max=2)
        out = v if out is None else f.mul(out, v)
    return out


def spartan_prove(pp, U: RelaxedInstance, W: RelaxedWitness, tr: Transcript) -> SpartanProof:
    f = pp.field
    curve = get_curve(pp.curve_name)
    shape = pp.dev_shape
    s = shape.shape

    _absorb_instance(tr, f, curve, U)

    s1 = num_vars(s.num_cons)
    s2 = num_vars(s.num_vars)
    n1, n2 = 1 << s1, 1 << s2

    z = shape.z_vector(f, W.w, U.x, U.u)
    z_pad = pad_to_pow2(f, z)
    az = _matvec_padded(f, shape.a, z, n1)
    bz = _matvec_padded(f, shape.b, z, n1)
    cz = _matvec_padded(f, shape.c, z, n1)
    e_pad = pad_to_pow2(f, W.e)

    tau = [tr.squeeze() for _ in range(s1)]
    eq_t = eq_table(f, tau)

    zero = jnp.asarray(f.zero)
    rs_x, finals1, msgs1 = sumcheck_prove(
        f, tr, [eq_t, az, bz, cz, e_pad], 3, "spartan_outer", zero, aux=(U.u,)
    )
    vA, vB, vC, vE = finals1[1], finals1[2], finals1[3], finals1[4]
    for v in (vA, vB, vC, vE):
        tr.absorb(v)
    gamma = tr.squeeze()

    eq_rx = eq_table(f, rs_x)[:n1]
    m_vec = _gamma_matrix_vector(f, shape, eq_rx, gamma, n2)

    g2 = f.mul(gamma, gamma)
    claim2 = f.partial_reduce(
        f.add(vA, f.add(f.mul(gamma, vB), f.mul(g2, vC))), k_max=2
    )
    rs_y, finals2, msgs2 = sumcheck_prove(f, tr, [m_vec, z_pad], 2, "product", claim2)

    # Openings.
    n_w = 1 << num_vars(s.num_aux)
    eq_ry = eq_table(f, rs_y)[: 1 << s2]
    w_pad = pad_to_pow2(f, W.w)[:n_w]
    b_w = eq_ry[:n_w]
    vW = _sum_rows(f, f.mul(w_pad, b_w))
    tr.absorb(vW)

    ck = pp.nifs.ck
    ipa_e = ipa_prove(f, curve, ck.gens, ck.h, e_pad[:n1], eq_rx, tr)
    ipa_w = ipa_prove(f, curve, ck.gens, ck.h, w_pad, b_w, tr)
    msgs1 = tuple(tuple(m) for m in msgs1)
    msgs2 = tuple(tuple(m) for m in msgs2)
    return SpartanProof(msgs1, vA, vB, vC, vE, msgs2, vW, ipa_e, ipa_w)


def spartan_verify(pp, U: RelaxedInstance, proof: SpartanProof, tr: Transcript):
    """Traceable verification: returns a device bool."""
    f = pp.field
    curve = get_curve(pp.curve_name)
    shape = pp.dev_shape
    s = shape.shape

    _absorb_instance(tr, f, curve, U)
    s1 = num_vars(s.num_cons)
    s2 = num_vars(s.num_vars)
    n1, n2 = 1 << s1, 1 << s2
    if len(proof.sc1_messages) != s1 or len(proof.sc2_messages) != s2:
        return jnp.asarray(False)

    tau = [tr.squeeze() for _ in range(s1)]
    zero = jnp.asarray(f.zero)
    rs_x, final1, ok = sumcheck_verify(f, tr, proof.sc1_messages, zero, degree=3)
    eq_tau_rx = _eq_point(f, tau, rs_x)
    inner = f.sub(
        f.mul(proof.vA, proof.vB),
        f.add(f.mul(U.u, proof.vC), proof.vE),
    )
    ok &= jnp.all(f.eq(final1, f.mul(eq_tau_rx, inner)))

    for v in (proof.vA, proof.vB, proof.vC, proof.vE):
        tr.absorb(v)
    gamma = tr.squeeze()
    g2 = f.mul(gamma, gamma)
    claim2 = f.partial_reduce(
        f.add(proof.vA, f.add(f.mul(gamma, proof.vB), f.mul(g2, proof.vC))), k_max=2
    )
    rs_y, final2, ok2 = sumcheck_verify(f, tr, proof.sc2_messages, claim2, degree=2)
    ok &= ok2

    eq_rx = eq_table(f, rs_x)[:n1]
    eq_ry = eq_table(f, rs_y)[:n2]
    m_ry = _eval_gamma_matrix(f, shape, eq_rx, eq_ry, gamma)

    # z(r_y) = vW (committed part) + u·eq_ry[num_aux] + Σ X_i·eq_ry[...]
    pub = f.mul(U.u, eq_ry[s.num_aux])
    for i in range(s.num_inputs):
        pub = f.partial_reduce(
            f.add(pub, f.mul(U.x[i], eq_ry[s.num_aux + 1 + i])), k_max=2
        )
    z_ry = f.partial_reduce(f.add(proof.vW, pub), k_max=2)
    ok &= jnp.all(f.eq(final2, f.mul(m_ry, z_ry)))

    tr.absorb(proof.vW)
    ck = pp.nifs.ck
    n_w = 1 << num_vars(s.num_aux)
    ok &= ipa_verify(
        f, curve, ck.gens, ck.h, U.comm_e, eq_rx, proof.vE, proof.ipa_e, tr
    )
    ok &= ipa_verify(
        f, curve, ck.gens, ck.h, U.comm_w, eq_ry[:n_w], proof.vW, proof.ipa_w, tr
    )
    return ok
