"""Fused-kernel arithmetic tests (CPU-runnable, no Pallas interpreter).

The kernel bodies (fields/pallas_field.py) are built from KernelField
limb-list ops that are ordinary jnp computations — they are tested here
directly against the exact int oracle, which covers every arithmetic
path the fused eval/inverse kernels execute.  The pallas_call wrappers
themselves are exercised on real TPU hardware by bench.py's correctness
gates (full-eval graphs are ~10^6 primitives — far too large for the
Pallas interpreter on CPU).
"""

import jax.numpy as jnp
import pytest

from vdf_tpu.fields.int_field import get_int_field
from vdf_tpu.fields.pallas_field import (
    KernelField,
    NL12,
    R12_BITS,
    _resolve,
    _to_limbs12,
    kernel_consts,
)

R12 = 1 << R12_BITS


def enc(v: int):
    """Canonical int -> kernel limb list (Montgomery R=2^264), (1,1) lanes."""
    return [jnp.full((1, 1), int(x), jnp.int32) for x in _to_limbs12(v)]


def dec(limbs, p: int) -> int:
    """Kernel limb list -> canonical int (out of Montgomery form)."""
    v = sum(int(x[0, 0]) << (12 * k) for k, x in enumerate(limbs))
    return v * pow(R12, -1, p) % p


def to_mont(v: int, p: int) -> int:
    return v * R12 % p


@pytest.fixture(scope="module", params=["Fp", "Fq"])
def field(request):
    return request.param


def test_mul_sqr_match_oracle(field):
    p = get_int_field(field).p
    kf = KernelField(field)
    a, b = 0x1234567890ABCDEF << 180 | 0x9E3779B9, p - 12345
    am, bm = enc(to_mont(a, p)), enc(to_mont(b, p))
    assert dec(kf.mul(am, bm), p) == a * b % p
    assert dec(kf.sqr(am), p) == a * a % p


def test_add_resolve_cond_sub(field):
    p = get_int_field(field).p
    kf = KernelField(field)
    a, b = p - 1, p - 2
    s = kf.cond_sub_p(kf.cond_sub_2p(_resolve(kf.add(enc(a), enc(b)), NL12)))
    assert sum(int(x[0, 0]) << (12 * k) for k, x in enumerate(s)) == (a + b) % p


def test_neg2p_subtracts(field):
    p = get_int_field(field).p
    kf = KernelField(field)
    for a, b in [(5, 7), (p - 1, 1), (0, p - 1), (123456789, 123456789)]:
        out = kf.reduce4p(kf.add(enc(a), kf.neg2p(enc(b))))
        assert sum(int(x[0, 0]) << (12 * k) for k, x in enumerate(out)) == (a - b) % p


def test_inverse_round_body(field):
    """One inverse MinRoot round with kernel ops == the int spec
    (/root/reference/src/minroot.rs:338-344)."""
    p = get_int_field(field).p
    kf = KernelField(field)
    x, y, i = 0xDEADBEEF, 0xCAFEBABE, 7
    xm, ym, im = enc(to_mont(x, p)), enc(to_mont(y, p)), enc(to_mont(i, p))
    pm1_l = [jnp.full((1, 1), int(v), jnp.int32) for v in kf.pm1_np]
    new_i = kf.cond_sub_p(_resolve(kf.add(im, pm1_l), NL12))
    new_x = kf.reduce4p(kf.add(ym, kf.neg2p(new_i)))
    x5 = kf.mul(kf.sqr(kf.sqr(xm)), xm)
    new_y = kf.reduce4p(kf.add(x5, kf.neg2p(new_x)))
    ei = (i - 1) % p
    ex = (y - ei) % p
    ey = (pow(x, 5, p) - ex) % p
    assert dec(new_i, p) == ei
    assert dec(new_x, p) == ex
    assert dec(new_y, p) == ey


def test_forward_pow_chain(field):
    """The eval kernel's windowed pow: 4-bit window square-and-multiply
    with kernel mul/sqr reproduces x^invalpha (one full slow step)."""
    fp = get_int_field(field)
    p = fp.p
    e = pow(5, -1, p - 1)
    kf = KernelField(field)
    from vdf_tpu.fields.pallas_field import _window_digits

    digits = _window_digits(e)
    x = 0x123456789
    xm = enc(to_mont(x, p))
    # table of x^k, k < 16
    table = [enc(to_mont(1, p)), [v for v in xm]]
    for k in range(2, 16):
        table.append(kf.mul(table[-1], xm))
    acc = table[int(digits[0])]
    for d in digits[1:]:
        for _ in range(4):
            acc = kf.sqr(acc)
        acc = kf.mul(acc, table[int(d)])
    assert dec(acc, p) == pow(x, e, p)
    assert pow(pow(x, e, p), 5, p) == x  # round-trip sanity
