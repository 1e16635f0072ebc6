"""Pallas wrapper smoke tests in interpreter mode (CPU-runnable).

tests/test_fused.py covers the kernels' *arithmetic* (KernelField limb
ops vs exact ints).  These tests execute the actual ``pallas_call``
launch plumbing — grid/BlockSpec/scalar-prefetch/VMEM-scratch — via
``interpret=True``, so a wrapper/API regression fails off-TPU instead
of only in bench.py's on-hardware gates.

The fast-lane tests drive the SHARED launch helpers
(``_eval_launch`` / ``_inverse_launch`` in fields/pallas_field.py —
the exact code the real kernels go through) with tiny surrogate kernel
bodies: the Pallas interpreter costs ~7 ms per kernel op on this box,
so a real MinRoot round (~6k ops) cannot run in the fast lane.  The
genuine full-kernel interpret run is the slow-lane test at the bottom.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from vdf_tpu.fields.pallas_field import (
    NL12,
    WINDOW,
    _eval_launch,
    _inverse_launch,
)


def _arrs(val: int = 0):
    x = jnp.arange(NL12 * 8 * 128, dtype=jnp.int32).reshape(NL12, 8, 128) % 1000
    return x + val, x + val + 1, x + val + 2


def test_eval_launch_plumbing():
    """Surrogate body through the eval-side launch helper: exercises the
    PrefetchScalarGridSpec (scalar-prefetch digits), the VMEM scratch
    table (write rows / read rows via pl.ds), the 3-in/3-out BlockSpecs
    and the grid iteration (2 blocks)."""
    digits = np.asarray([3, 1, 2], dtype=np.int32)

    def kernel(dig_ref, x_ref, y_ref, i_ref, ox_ref, oy_ref, oi_ref, tab_ref):
        # scratch write/read round trip on table row block d
        d = dig_ref[0]
        tab_ref[pl.ds(0, NL12)] = x_ref[...] + dig_ref[2]
        back = tab_ref[pl.ds(0, NL12)]
        for l in range(NL12):
            ox_ref[l] = back[l]
            oy_ref[l] = y_ref[l] + d
            oi_ref[l] = i_ref[l] * 2

    fn = _eval_launch(kernel, digits, block_sublanes=4, interpret=True)
    x, y, i = _arrs()
    ox, oy, oi = fn(x, y, i)  # S=8, bs=4 -> grid=(2,)
    np.testing.assert_array_equal(np.asarray(ox), np.asarray(x) + 2)
    np.testing.assert_array_equal(np.asarray(oy), np.asarray(y) + 3)
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(i) * 2)


def test_inverse_launch_plumbing():
    """Surrogate body through the inverse-side launch helper (plain grid,
    no prefetch/scratch), 2 grid blocks."""

    def kernel(x_ref, y_ref, i_ref, ox_ref, oy_ref, oi_ref):
        for l in range(NL12):
            ox_ref[l] = x_ref[l] + y_ref[l]
            oy_ref[l] = y_ref[l] - i_ref[l]
            oi_ref[l] = i_ref[l]

    fn = _inverse_launch(kernel, block_sublanes=4, interpret=True)
    x, y, i = _arrs(5)
    ox, oy, oi = fn(x, y, i)
    np.testing.assert_array_equal(np.asarray(ox), np.asarray(x) + np.asarray(y))
    np.testing.assert_array_equal(np.asarray(oy), np.asarray(y) - np.asarray(i))
    np.testing.assert_array_equal(np.asarray(oi), np.asarray(i))


def test_scratch_shape_matches_window_table():
    """The real eval kernel's scratch table must hold 2^WINDOW entries of
    NL12 rows — keep the surrogate and the real kernel in sync."""
    assert (1 << WINDOW) * NL12 == 16 * 22


@pytest.mark.slow
def test_inverse_kernel_interpret_full():
    """The genuine inverse kernel (t=1) through the interpreter: one
    verify round end-to-end off-TPU (slow lane: ~2-4 min — interpreter
    costs ~7 ms/op and a Montgomery mul is ~2k ops)."""
    from vdf_tpu.minroot import State, pallas_vdf
    from vdf_tpu.minroot.fused import inverse_eval_fused

    vdf = pallas_vdf()
    f = vdf.field
    s0 = State(f.encode([3, 7]), f.encode([5] * 2), f.encode([9] * 2))
    fwd = vdf.round(s0)
    back = inverse_eval_fused(vdf, fwd, t=1, block_sublanes=8, interpret=True)
    assert f.decode(back.x) == f.decode(s0.x)
    assert f.decode(back.y) == f.decode(s0.y)
    assert f.decode(back.i) == f.decode(s0.i)
