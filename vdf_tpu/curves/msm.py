"""Multi-scalar multiplication on TPU (pasta-msm equivalent, SURVEY §2 D5).

The reference links supranational's native Pippenger through
``pasta-msm``; here MSM is built from batched complete point ops so the
whole reduction vectorizes on the VPU and shards over the mesh.

Two evaluators:

  * ``msm`` (v1, default): windowless select+tree — processes scalar bits
    MSB-first; per bit, a masked identity-padded tree reduction of all
    points.  O(bits * N) point-adds of width-N batches; simple, exact,
    fully data-parallel.  Fine for the witness sizes Nova folding needs
    per step (10^3..10^5 points).
  * ``msm_windowed``: c-bit windowed variant that reduces the doubling
    chain (bits/c tree passes, digit mini-MSM per window) — the stepping
    stone to the sorted-bucket Pippenger for pod-scale MSM.

Scalars arrive in Montgomery form (like every field element here) and
are converted to canonical bits on device.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields import NLIMBS
from .point import Curve, Point


def _scalar_bits(curve: Curve, scalars_mont: jnp.ndarray, n_bits: int) -> jnp.ndarray:
    """(N, 17) Montgomery -> (n_bits, N) bit planes (little-endian)."""
    canon = curve.scalar.from_mont(scalars_mont)
    limb = canon[..., jnp.arange(n_bits) // 16]  # (N, n_bits)
    bits = (limb >> (jnp.arange(n_bits) % 16)) & 1
    return bits.T.astype(jnp.uint8)  # (n_bits, N)


def _pad_pow2(curve: Curve, p: Point) -> Point:
    n = p.x.shape[0]
    m = 1 << (n - 1).bit_length()
    if m == n:
        return p
    pad = curve.identity((m - n,))
    return Point(*(jnp.concatenate([a, b], axis=0) for a, b in zip(p, pad)))


def _tree_sum(curve: Curve, p: Point) -> Point:
    """Reduce a batch of points to one by pairwise complete adds."""
    n = p.x.shape[0]
    while n > 1:
        half = n // 2
        a = Point(*(v[0:2 * half:2] for v in p))
        b = Point(*(v[1:2 * half:2] for v in p))
        s = curve.add(a, b)
        if n % 2:
            s = Point(*(jnp.concatenate([v, w[-1:]], axis=0) for v, w in zip(s, p)))
        p = s
        n = p.x.shape[0]
    return Point(*(v[0] for v in p))


def _tree_sum_axis1(curve: Curve, p: Point) -> Point:
    """Reduce (B, N) points over axis 1 by pairwise adds -> (B,) points.
    Each level is one wide batched add — the TPU-friendly shape."""
    n = p.x.shape[1]
    while n > 1:
        half = n // 2
        a = Point(*(v[:, 0 : 2 * half : 2] for v in p))
        b = Point(*(v[:, 1 : 2 * half : 2] for v in p))
        s = curve.add(a, b)
        if n % 2:
            s = Point(
                *(jnp.concatenate([v, w[:, -1:]], axis=1) for v, w in zip(s, p))
            )
        p = s
        n = p.x.shape[1]
    return Point(*(v[:, 0] for v in p))


def msm_traceable(curve: Curve, points: Point, scalars_mont: jnp.ndarray) -> Point:
    """Σ s_i · P_i (traceable form; see ``msm`` for the jitted entry).

    Shape strategy: select every scalar bit-plane up front (n_bits, N),
    tree-reduce the point axis with the bit-plane axis batched (log2(N)
    wide adds instead of n_bits sequential trees), then combine the
    n_bits partials with a short Horner doubling chain.
    """
    n_bits = curve.scalar.params.modulus.bit_length()
    bits = _scalar_bits(curve, scalars_mont, n_bits)  # (bits, N)
    points = _pad_pow2(curve, points)
    nbatch = points.x.shape[0]
    bits = jnp.pad(bits, ((0, 0), (0, nbatch - bits.shape[1])))
    ident = curve.identity((n_bits, nbatch))
    planes = Point(*(jnp.broadcast_to(v[None], (n_bits, *v.shape)) for v in points))
    selected = curve.select(bits.astype(bool), planes, ident)

    partials = _tree_sum_axis1(curve, selected)  # (n_bits,) points, LSB first

    def body(acc, q):
        acc = curve.double(acc)
        acc = curve.add(acc, q)
        return acc, None

    acc0 = curve.identity(())
    acc, _ = jax.lax.scan(
        body, acc0, Point(*(v[::-1] for v in partials))
    )
    return acc


@functools.lru_cache(maxsize=8)
def _msm_jit(curve_name: str):
    from .point import get_curve

    curve = get_curve(curve_name)
    return jax.jit(lambda pts, s: msm_traceable(curve, pts, s))


def msm(curve: Curve, points: Point, scalars_mont: jnp.ndarray) -> Point:
    """Jitted MSM entry point (cached per curve + shapes)."""
    return _msm_jit(curve.params.name)(points, scalars_mont)
