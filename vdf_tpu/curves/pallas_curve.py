"""In-kernel Pasta curve arithmetic for Pallas TPU kernels.

Plays pasta-msm's role of "the native point-op tier" (SURVEY.md §2 D5,
/root/reference/Cargo.toml:18) at the level below curves/msm.py: complete
RCB15 a=0 point addition/doubling over the radix-12 int32 limb
representation of fields/pallas_field.py, expressed as straight-line
vreg arithmetic suitable for use inside ``pallas_call`` bodies.

Values and bounds (all limbs int32):

  * a field element is a list of NL12=22 limb arrays; "canonical" means
    every limb < 2^12 (value may exceed p).
  * point coordinates are kept canonical with value < 4p between ops;
    complete add/double accept that and return it.
  * two-term lazy sums of canonical elements (limbs < 2^13) may feed
    multiplications directly: schoolbook conv terms stay < 22*2^26 < 2^31.
  * subtraction a - b adds a borrow-ready representation of k*p - b
    (limb-wise nonnegative), then resolves; helpers below build the
    borrow-ready tables for each subtrahend class.

Everything here is also exact under ``interpret=True`` (the CPU test
path used by tests/test_pallas_msm.py).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields.pallas_field import (
    KB,
    KMASK,
    NL12,
    KernelField,
    _conv_sqr,
    _const_list,
    _resolve,
    _to_limbs12,
    kernel_consts,
)


def _borrow_ready(value: int, floors: list[int]) -> np.ndarray:
    """Limbs l_i with sum(l_i * 2^(12 i)) == value and l_i >= floors[i].

    Adding these limbs to ``a`` and subtracting ``b`` limb-wise stays
    nonnegative whenever b's limbs are <= floors, while shifting the
    value by exactly ``value`` — the generalized form of the d2p trick in
    fields/pallas_field.py::kernel_consts.
    """
    base = sum(f << (KB * i) for i, f in enumerate(floors))
    rest = value - base
    assert rest >= 0, "borrow-ready table infeasible: value too small"
    limbs = _to_limbs12(rest).astype(np.int64)
    out = limbs + np.asarray(floors, dtype=np.int64)
    assert (out < (1 << 15)).all(), "borrow-ready limbs exceed 2^15"
    assert sum(int(v) << (KB * i) for i, v in enumerate(out)) == value
    return out.astype(np.int32)


@functools.cache
def _curve_consts(base_field: str):
    c = kernel_consts(base_field)
    p = c["modulus"]
    mx = KMASK  # max canonical limb

    def dkp(k: int, n_terms: int) -> np.ndarray:
        # subtract a sum of n_terms canonical values each < 2p (i.e. raw
        # Montgomery-mul outputs): limbs <= n*mx, top limb <= n*(2p>>252 + 1).
        top = n_terms * (((2 * p) >> (KB * (NL12 - 1))) + 1)
        return _borrow_ready(k * p, [n_terms * mx] * (NL12 - 1) + [top])

    return {
        "one": c["one"],
        "b3_mont": _to_limbs12((15 << (KB * NL12)) % p),  # 3*b = 15, Montgomery
        "d3p_1": dkp(3, 1),  # a - b, one subtrahend (result < a + 3p)
        "d5p_2": dkp(5, 2),  # a - (b1 + b2)       (result < a + 5p)
        "d8p_3": dkp(8, 3),  # a - 3*b             (result < a + 8p)
        "modulus": p,
    }


class KernelPoint:
    """Projective (X:Y:Z), each a list of NL12 limb arrays."""

    __slots__ = ("x", "y", "z")

    def __init__(self, x: list, y: list, z: list):
        self.x, self.y, self.z = x, y, z

    def tree(self):
        return (self.x, self.y, self.z)


class KernelCurve:
    """Complete RCB15 a=0 group ops (mirrors curves/point.py:88-129) over
    kernel limbs; usable inside Pallas kernel bodies."""

    def __init__(self, base_field: str):
        self.kf = KernelField(base_field)
        c = _curve_consts(base_field)
        self.one_np = c["one"]
        self.b3_np = c["b3_mont"]
        self.d3p_1 = c["d3p_1"]
        self.d5p_2 = c["d5p_2"]
        self.d8p_3 = c["d8p_3"]

    # -- helpers -------------------------------------------------------

    def identity(self, like: jnp.ndarray) -> KernelPoint:
        """(0 : 1 : 0) in the kernel Montgomery domain."""
        zero = [jnp.zeros_like(like) for _ in range(NL12)]
        one = _const_list(self.one_np, like)
        return KernelPoint(zero, one, [jnp.zeros_like(like) for _ in range(NL12)])

    def _sub1(self, a: list, b: list) -> list:
        """a - b (+3p), b one Montgomery-mul output; resolved canonical."""
        like = a[0]
        d = _const_list(self.d3p_1, like)
        return _resolve([x + dx - y for x, dx, y in zip(a, d, b)], NL12)

    def _sub2(self, a: list, b1: list, b2: list) -> list:
        """a - b1 - b2 (+5p); resolved canonical."""
        like = a[0]
        d = _const_list(self.d5p_2, like)
        return _resolve(
            [x + dx - y1 - y2 for x, dx, y1, y2 in zip(a, d, b1, b2)], NL12
        )

    def _sub3(self, a: list, b3: list) -> list:
        """a - 3*b (+8p); resolved canonical."""
        like = a[0]
        d = _const_list(self.d8p_3, like)
        return _resolve([x + dx - 3 * y for x, dx, y in zip(a, d, b3)], NL12)

    @staticmethod
    def _add2(a: list, b: list) -> list:
        """Resolved sum of two canonical values (for output coords)."""
        return _resolve([x + y for x, y in zip(a, b)], NL12)

    def select(self, mask: jnp.ndarray, p: KernelPoint, q: KernelPoint) -> KernelPoint:
        """mask ? p : q, limb-wise (mask: bool array of the vreg shape)."""
        pick = lambda a, b: [jnp.where(mask, x, y) for x, y in zip(a, b)]
        return KernelPoint(pick(p.x, q.x), pick(p.y, q.y), pick(p.z, q.z))

    # -- group law ------------------------------------------------------

    def add(self, p: KernelPoint, q: KernelPoint) -> KernelPoint:
        """Complete add; coords in/out canonical, value < 4p."""
        kf = self.kf
        b3 = _const_list(self.b3_np, p.x[0])
        x1, y1, z1 = p.x, p.y, p.z
        x2, y2, z2 = q.x, q.y, q.z
        lazy = lambda a, b: [x + y for x, y in zip(a, b)]  # 2-term, mul-safe

        t0 = kf.mul(x1, x2)
        t1 = kf.mul(y1, y2)
        t2 = kf.mul(z1, z2)
        t3 = self._sub2(kf.mul(lazy(x1, y1), lazy(x2, y2)), t0, t1)
        t4 = self._sub2(kf.mul(lazy(y1, z1), lazy(y2, z2)), t1, t2)
        y3 = self._sub2(kf.mul(lazy(x1, z1), lazy(x2, z2)), t0, t2)
        x3 = [3 * v for v in t0]  # 3-term lazy; only ever a mul operand
        t2b = kf.mul(b3, t2)
        z3 = lazy(t1, t2b)
        t1n = self._sub1(t1, t2b)
        y3b = kf.mul(b3, y3)
        x_out = self._sub1(kf.mul(t3, t1n), kf.mul(t4, y3b))
        y_out = self._add2(kf.mul(t1n, z3), kf.mul(y3b, x3))
        z_out = self._add2(kf.mul(z3, t4), kf.mul(x3, t3))
        return KernelPoint(x_out, y_out, z_out)

    def double(self, p: KernelPoint) -> KernelPoint:
        """Complete double (RCB15 alg 9, a=0)."""
        kf = self.kf
        b3 = _const_list(self.b3_np, p.x[0])
        x, y, z = p.x, p.y, p.z

        t0 = kf._mont_reduce(_conv_sqr(y))
        z3 = _resolve([8 * v for v in t0], NL12)  # < 16p, canonical limbs
        t1 = kf.mul(y, z)
        t2 = kf.mul(b3, kf._mont_reduce(_conv_sqr(z)))
        x3 = kf.mul(t2, z3)
        y3 = [a + b for a, b in zip(t0, t2)]  # 2-term lazy
        z_out = kf.mul(t1, z3)
        t0n = self._sub3(t0, t2)  # t0 - 3*t2, canonical < 10p
        y_out = self._add2(kf.mul(t0n, y3), x3)
        xy = kf.mul(x, y)
        xt = kf.mul(xy, t0n)
        x_out = _resolve([2 * v for v in xt], NL12)
        return KernelPoint(x_out, y_out, z_out)
