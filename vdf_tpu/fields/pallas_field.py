"""Pallas TPU kernels for Pasta field arithmetic + fused MinRoot eval.

Kernel-side representation (differs from the pure-JAX path deliberately):

  * radix 2^12, ``NL12 = 22`` limbs, **int32** — products of (even
    slightly redundant) limbs stay below 2^31, so no unsigned tricks and
    no per-product splitting are needed; a 22x22 schoolbook convolution
    is 484 single-instruction MACs on the VPU.
  * Montgomery radix ``R12 = 2^264`` (22 limbs exactly).  The pure-JAX
    path uses R = 2^272, so crossing the kernel boundary multiplies by a
    small constant (one extra Montgomery mul each way).
  * layout ``(22, sublanes, 128)``: limb-major, so each limb of a batch
    tile is exactly one (8, 128) vreg; all field ops are straight-line
    vreg arithmetic with zero shuffles.

The fused eval kernel keeps the whole t-round loop on-chip: state never
touches HBM between rounds, the 254-bit exponentiation runs as a
windowed scan against a VMEM table (window digits are scalar-prefetched),
and the counter/linear updates ride along in registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .params import FieldParams, NLIMBS as NL16

KB = 12  # kernel limb bits
NL12 = 22  # kernel limbs: 22 * 12 = 264
R12_BITS = KB * NL12  # 264
KMASK = (1 << KB) - 1


def _to_limbs12(v: int, n: int = NL12) -> np.ndarray:
    out = np.zeros(n, dtype=np.int32)
    for k in range(n):
        out[k] = v & KMASK
        v >>= KB
    assert v == 0
    return out


@functools.cache
def kernel_consts(field_name: str):
    """Radix-12 constant tables for one field."""
    from .params import FP, FQ

    P = {"Fp": FP, "Fq": FQ}[field_name]
    p = P.modulus
    r12 = 1 << R12_BITS
    # Borrow-ready limbs of 2p: every limb >= 0xfff (top >= p>>252, the
    # max top limb of a canonical <p value), so (d2p - b) is limb-wise
    # nonnegative for any canonical b < p while summing to exactly 2p.
    d2p = _to_limbs12(2 * p).astype(np.int64)
    d2p[0] += 1 << KB
    d2p[1:-1] += (1 << KB) - 1
    d2p[-1] -= 1
    assert (d2p[:-1] >= KMASK).all() and d2p[-1] >= (p >> (KB * (NL12 - 1)))
    return {
        "p": _to_limbs12(p),
        "pinv": _to_limbs12((-pow(p, -1, r12)) % r12),
        "one": _to_limbs12(r12 % p),  # Montgomery(2^264) one
        "r_to_kernel": (1 << R12_BITS) % p,  # jnp-mont -> kernel-mont factor
        "r_from_kernel": (1 << (272 + 8)) % p,  # kernel-mont -> jnp-mont factor
        "comp_p": _to_limbs12((1 << R12_BITS) - p),  # for conditional subtract
        "comp_2p": _to_limbs12((1 << R12_BITS) - 2 * p),
        "d2p": d2p.astype(np.int32),
        "pm1_mont": _to_limbs12(p - (r12 % p)),  # Montgomery(-1): p - R mod p
        "modulus": p,
    }


# ----------------------------------------------------------------------
# in-kernel limb-list arithmetic (values are lists of NL12 (S,128) int32)
# ----------------------------------------------------------------------


def _resolve(v: list, n_out: int, passes: int = 3) -> list:
    """Carry resolution of redundant limbs (<2^31); value preserved
    modulo 2^(12*n_out).

    ``passes=3`` (default) yields canonical limbs (< 2^12).  ``passes=2``
    yields semi-canonical limbs (< 2^12 + 131): enough for any further
    convolution (products stay < 2^29) but NOT for the borrow-ready
    subtraction tables, whose floors assume canonical subtrahends — use
    it only for values that feed multiplies (the Montgomery t_low / m
    intermediates)."""
    v = list(v) + [jnp.zeros_like(v[0])] * (n_out - len(v))
    v = v[:n_out]
    for _ in range(passes):
        out = []
        carry = None
        for x in v:
            if carry is not None:
                x = x + carry
            out.append(jnp.bitwise_and(x, KMASK))
            carry = jax.lax.shift_right_logical(x, KB)
        v = out
    return v


def _resolve_with_carry(v: list, n_out: int, carry_limbs: int = 1):
    """Like _resolve but also returns the carry out as extra limbs."""
    r = _resolve(v, n_out + carry_limbs)
    return r[:n_out], r[n_out:]


def _conv_full(a: list, b: list) -> list:
    """Schoolbook convolution: 484 MACs, redundant output (43 limbs)."""
    n = len(a)
    z = [None] * (2 * n - 1)
    for i in range(n):
        for j in range(n):
            t = a[i] * b[j]
            k = i + j
            z[k] = t if z[k] is None else z[k] + t
    return z


def _conv_sqr(a: list) -> list:
    """Squaring convolution: exploit symmetry (2*off-diag + diag)."""
    n = len(a)
    z = [None] * (2 * n - 1)
    for i in range(n):
        for j in range(i + 1, n):
            t = a[i] * a[j]
            k = i + j
            z[k] = t if z[k] is None else z[k] + t
    z = [None if x is None else x + x for x in z]
    for i in range(n):
        t = a[i] * a[i]
        k = 2 * i
        z[k] = t if z[k] is None else z[k] + t
    return z


def _conv_trunc(a: list, b: list, n_out: int) -> list:
    """Convolution truncated to the low n_out limbs (mod 2^(12*n_out))."""
    z = [None] * n_out
    for i in range(len(a)):
        for j in range(len(b)):
            k = i + j
            if k < n_out:
                t = a[i] * b[j]
                z[k] = t if z[k] is None else z[k] + t
    return [jnp.zeros_like(a[0]) if x is None else x for x in z]


def _conv_const_full(a: list, const_np: np.ndarray, like) -> list:
    """Full convolution with a host-known constant, skipping its zero
    limbs.  The Pasta moduli are 2^254 + c with c ~126 bits, so p has
    only ~12 nonzero radix-12 limbs — the Montgomery m*p product drops
    from 484 to ~260 MACs."""
    n = len(a)
    z = [None] * (2 * n - 1)
    for j, cv in enumerate(const_np):
        cv = int(cv)
        if cv == 0:
            continue
        cj = jnp.full_like(like, cv)
        for i in range(n):
            k = i + j
            t = a[i] * cj
            z[k] = t if z[k] is None else z[k] + t
    return [jnp.zeros_like(like) if x is None else x for x in z]


def _const_list(arr: np.ndarray, like: jnp.ndarray) -> list:
    return [jnp.full_like(like, int(v)) for v in arr]


class KernelField:
    """Field ops over limb lists, closed over one field's constants."""

    def __init__(self, field_name: str):
        c = kernel_consts(field_name)
        self.p_np = c["p"]
        self.pinv_np = c["pinv"]
        self.one_np = c["one"]
        self.comp_p_np = c["comp_p"]
        self.comp_2p_np = c["comp_2p"]
        self.d2p_np = c["d2p"]
        self.pm1_np = c["pm1_mont"]

    def _mont_reduce(self, t_raw: list) -> list:
        """(T + m*p)/R for redundant T (43 limbs); output canonical < 2p.

        The t_low/m intermediates only feed further convolutions, so
        2-pass semi-canonical resolves suffice (see _resolve); m*p uses
        the zero-limb-skipping constant convolution.  Together ~20%
        fewer VPU ops per multiply."""
        t_low = _resolve(t_raw[:NL12], NL12, passes=2)
        like = t_low[0]
        m = _resolve(
            _conv_trunc(t_low, _const_list(self.pinv_np, like), NL12),
            NL12,
            passes=2,
        )
        mp = _conv_const_full(m, self.p_np, like)
        total = [
            (t_raw[k] if k < len(t_raw) else jnp.zeros_like(like))
            + (mp[k] if k < len(mp) else jnp.zeros_like(like))
            for k in range(2 * NL12)
        ]
        # Low half resolves to zero mod R; its carry out (raw limbs are
        # ~2^29, so the carry spans up to two 12-bit limbs) joins the high
        # half before the final resolution.
        _, carry = _resolve_with_carry(total[:NL12], NL12, carry_limbs=2)
        high = list(total[NL12:])
        high[0] = high[0] + carry[0]
        high[1] = high[1] + carry[1]
        return _resolve(high, NL12)

    def mul(self, a: list, b: list) -> list:
        return self._mont_reduce(_conv_full(a, b))

    def sqr(self, a: list) -> list:
        return self._mont_reduce(_conv_sqr(a))

    def add(self, a: list, b: list) -> list:
        return [x + y for x, y in zip(a, b)]

    def cond_sub_p(self, a: list) -> list:
        """If a >= p subtract p (a must be canonical, < 2p)."""
        return self._cond_sub(a, self.comp_p_np)

    def cond_sub_2p(self, a: list) -> list:
        """If a >= 2p subtract 2p (a canonical, < 4p)."""
        return self._cond_sub(a, self.comp_2p_np)

    def _cond_sub(self, a: list, comp_np) -> list:
        like = a[0]
        w, carry = _resolve_with_carry(
            [x + c for x, c in zip(a, _const_list(comp_np, like))], NL12
        )
        take = carry[0] > 0
        return [jnp.where(take, wx, ax) for wx, ax in zip(w, a)]

    def neg2p(self, b: list) -> list:
        """2p - b as limb-wise nonnegative lazy limbs (b canonical < p):
        adding it subtracts b modulo p."""
        like = b[0]
        return [c - x for c, x in zip(_const_list(self.d2p_np, like), b)]

    def reduce4p(self, a: list) -> list:
        """Lazy value < 4p -> canonical < p."""
        return self.cond_sub_p(self.cond_sub_2p(_resolve(a, NL12)))


# ----------------------------------------------------------------------
# fused MinRoot eval kernel
# ----------------------------------------------------------------------

WINDOW = 4


def _window_digits(e: int) -> np.ndarray:
    bits = bin(e)[2:]
    pad = (-len(bits)) % WINDOW
    bits = "0" * pad + bits
    return np.asarray(
        [int(bits[k : k + WINDOW], 2) for k in range(0, len(bits), WINDOW)],
        dtype=np.int32,
    )


def _minroot_eval_kernel(field_name: str, t: int, digits: np.ndarray):
    """Kernel body: t MinRoot rounds, fully on-chip."""
    kf = KernelField(field_name)
    n_dig = len(digits)

    def kernel(dig_ref, x_ref, y_ref, i_ref, ox_ref, oy_ref, oi_ref, tab_ref):
        def load(ref):
            return [ref[l] for l in range(NL12)]

        def store(ref, val):
            for l in range(NL12):
                ref[l] = val[l]

        one = _const_list(kf.one_np, x_ref[0])

        def pow_window(base: list) -> list:
            # Build table[k] = base^k in VMEM (rows k*NL12 .. +NL12).
            def store_rows(e, val):
                tab_ref[pl.ds(e * NL12, NL12)] = jnp.stack(val)

            base = _resolve(base, NL12)
            store_rows(0, one)
            store_rows(1, base)

            def build(e, prev):
                cur = kf.mul(prev, base)
                store_rows(e, cur)
                return cur

            jax.lax.fori_loop(2, 1 << WINDOW, build, base)

            def read_rows(d):
                rows = tab_ref[pl.ds(d * NL12, NL12)]
                return [rows[l] for l in range(NL12)]

            acc = read_rows(int(digits[0]))  # static index value via closure

            def win_body(k, acc):
                acc = jax.lax.fori_loop(0, WINDOW, lambda _, a: kf.sqr(a), acc)
                d = dig_ref[k]
                return kf.mul(acc, read_rows(d))

            return jax.lax.fori_loop(1, n_dig, win_body, acc)

        def round_body(_, state):
            x, y, i = state
            new_x = pow_window(kf.add(x, y))
            new_y = _resolve(kf.add(x, i), NL12)
            new_i = kf.cond_sub_p(_resolve(kf.add(i, one), NL12))
            return (new_x, new_y, new_i)

        x, y, i = load(x_ref), load(y_ref), load(i_ref)
        x, y, i = jax.lax.fori_loop(0, t, round_body, (x, y, i))
        store(ox_ref, x)
        store(oy_ref, y)
        store(oi_ref, i)

    return kernel


def _eval_launch(kernel, digits: np.ndarray, block_sublanes: int, interpret: bool):
    """The eval-side pallas_call plumbing (grid/BlockSpec/scalar-prefetch/
    VMEM scratch), shared by the real kernel and the CI smoke surrogate
    (tests/test_fused_interpret.py) so wrapper regressions fail off-TPU."""
    bs = block_sublanes

    def run(x, y, i):
        S = x.shape[1]
        grid = (S // bs,)
        spec = pl.BlockSpec(
            (NL12, bs, 128), lambda b, *_: (0, b, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((NL12, S, 128), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[spec] * 3,
                out_specs=[spec] * 3,
                scratch_shapes=[
                    pltpu.VMEM(((1 << WINDOW) * NL12, bs, 128), jnp.int32)
                ],
            ),
            out_shape=[out_shape] * 3,
            interpret=interpret,
        )(jnp.asarray(digits), x, y, i)

    return jax.jit(run)


@functools.lru_cache(maxsize=16)
def minroot_eval_tpu(
    field_name: str, t: int, block_sublanes: int = 8, interpret: bool = False
):
    """Compiled fused eval: (x, y, i) limb12 arrays (22, S, 128) -> same.

    S (total sublanes) must be a multiple of block_sublanes; the grid
    tiles the lane batch.  Lanes per call = S * 128.  ``interpret=True``
    runs the kernel in the Pallas interpreter (CPU test path).
    """
    from .params import FP, FQ

    P = {"Fp": FP, "Fq": FQ}[field_name]
    digits = _window_digits(P.inv_alpha)
    kernel = _minroot_eval_kernel(field_name, t, digits)
    return _eval_launch(kernel, digits, block_sublanes, interpret)


def _minroot_inverse_kernel(field_name: str, t: int):
    """Kernel body: t inverse MinRoot rounds (the verify direction,
    /root/reference/src/minroot.rs:338-344): i' = i-1, x' = y-i',
    y' = x^5 - x'.  Three multiplies + two modular subtractions per
    round — no exponent table needed."""
    kf = KernelField(field_name)

    def kernel(x_ref, y_ref, i_ref, ox_ref, oy_ref, oi_ref):
        def load(ref):
            return [ref[l] for l in range(NL12)]

        def store(ref, val):
            for l in range(NL12):
                ref[l] = val[l]

        pm1 = _const_list(kf.pm1_np, x_ref[0])

        def round_body(_, state):
            x, y, i = state  # canonical < p
            new_i = kf.cond_sub_p(_resolve(kf.add(i, pm1), NL12))  # < p
            new_x = kf.reduce4p(kf.add(y, kf.neg2p(new_i)))  # y-i' < 3p -> < p
            x5 = kf.mul(kf.sqr(kf.sqr(x)), x)  # < 2p
            new_y = kf.reduce4p(kf.add(x5, kf.neg2p(new_x)))  # < 4p -> < p
            return (new_x, new_y, new_i)

        # inputs arrive canonical < 2p (the domain-switch multiply's
        # bound); normalize so they qualify as subtrahends.
        x, y, i = (kf.cond_sub_p(load(r)) for r in (x_ref, y_ref, i_ref))
        x, y, i = jax.lax.fori_loop(0, t, round_body, (x, y, i))
        store(ox_ref, x)
        store(oy_ref, y)
        store(oi_ref, i)

    return kernel


def _inverse_launch(kernel, block_sublanes: int, interpret: bool):
    """The inverse-side pallas_call plumbing, shared by the real kernel
    and the CI smoke surrogate (tests/test_fused_interpret.py)."""
    bs = block_sublanes

    def run(x, y, i):
        S = x.shape[1]
        grid = (S // bs,)
        spec = pl.BlockSpec(
            (NL12, bs, 128), lambda b: (0, b, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((NL12, S, 128), jnp.int32)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec] * 3,
            out_specs=[spec] * 3,
            out_shape=[out_shape] * 3,
            interpret=interpret,
        )(x, y, i)

    return jax.jit(run)


@functools.lru_cache(maxsize=16)
def minroot_inverse_tpu(
    field_name: str, t: int, block_sublanes: int = 8, interpret: bool = False
):
    """Compiled fused inverse eval (verify): (x, y, i) limb12 arrays
    (22, S, 128) -> same, walking the chain backward t rounds."""
    kernel = _minroot_inverse_kernel(field_name, t)
    return _inverse_launch(kernel, block_sublanes, interpret)


# ----------------------------------------------------------------------
# boundary conversion: jnp (radix-16, R=2^272) <-> kernel (radix-12, 2^264)
# ----------------------------------------------------------------------


def repack_16_to_12(a16: jnp.ndarray) -> jnp.ndarray:
    """(..., 17) uint32 canonical -> (..., 22) int32 canonical (same value)."""
    limbs = []
    for k in range(NL12):
        bit = KB * k
        a_idx, s = bit >> 4, bit & 15
        chunk = a16[..., a_idx] >> s
        if a_idx + 1 < NL16 and s != 0:
            chunk = chunk | (a16[..., a_idx + 1] << (16 - s))
        limbs.append((chunk & KMASK).astype(jnp.int32))
    return jnp.stack(limbs, axis=-1)


def repack_12_to_16(a12: jnp.ndarray) -> jnp.ndarray:
    """(..., 22) int32 canonical -> (..., 17) uint32 canonical."""
    a12 = a12.astype(jnp.uint32)
    limbs = []
    for j in range(NL16):
        bit = 16 * j
        a_idx, s = bit // KB, bit % KB
        chunk = a12[..., a_idx] >> s
        if a_idx + 1 < NL12:
            chunk = chunk | (a12[..., a_idx + 1] << (KB - s))
        if a_idx + 2 < NL12 and (24 - s) < 16:
            chunk = chunk | (a12[..., a_idx + 2] << (2 * KB - s))
        limbs.append(chunk & 0xFFFF)
    return jnp.stack(limbs, axis=-1)
