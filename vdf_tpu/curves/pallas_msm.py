"""Pallas TPU Pippenger MSM: the native-speed pasta-msm tier.

The reference accelerates MSM with supranational's native C/C++ library
(/root/reference/Cargo.toml:18, SURVEY.md §2 D5); the XLA formulation in
curves/msm.py is correct but dispatch/HBM-bound (~10 ms floor per batched
point-add pass on a v5e).  Here the whole bucket accumulation runs inside
Pallas kernels on the radix-12 int32 representation
(fields/pallas_field.py), so the ~N complete adds per window execute as
straight-line VPU code on VMEM-resident data.

Pipeline (sorted-bucket Pippenger, window width c = 12 = the kernel limb
radix, so canonical scalar limbs ARE the window digits):

  1. scalar canon kernel — Montgomery scalars -> canonical limbs =
     all 22 window digits at once.
  2. XLA: per window, sort (digit, index) keys, gather points into the
     column-major (R, 3, 22, S, 128) scan layout, compute run heads.
  3. phase-1 scan kernel — sequential run-prefix accumulation down the
     R rows of every column (complete adds, identity-reset at heads).
  4. column-scan kernel — segmented Hillis–Steele over the L per-column
     summaries -> the carry flowing into each column.
  5. XLA: extract run tails + the column carries that apply to them,
     scatter both into (2^c,) bucket arrays (pure data movement).
  6. bucket kernel — add carries, double suffix-scan (Σ_b b·B_b = Σ_b S_b)
     via lane/sublane rolls, emit one point per window.
  7. variable-base only: Horner kernel — fold the per-window sums with
     c doublings between windows.

Fixed-base commits (Pedersen keys: nova/pedersen.py) skip the Horner
chain entirely: the generator table is pre-shifted per window
(G_i^(w) = 2^(cw)·G_i, built once by the shift kernel), turning the
whole MSM into ONE bucket accumulation over W·N items.

Correctness is gated on real TPU hardware against the native C++ oracle
(tests/test_pallas_msm.py and the bench.py gates); the interpreter
fallback exists but XLA:CPU cannot compile these kernel graphs in
useful time, so off-TPU callers use curves/msm.py instead.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import int_to_limbs
from ..fields.pallas_field import (
    KB,
    NL12,
    KernelField,
    _const_list,
    _to_limbs12,
    kernel_consts,
    repack_12_to_16,
    repack_16_to_12,
)
from .pallas_curve import KernelCurve, KernelPoint
from .point import Curve, Point

C = KB  # window bits == kernel radix
NB = 1 << C  # buckets per window
W = -(-255 // C)  # 22 windows cover any Pasta scalar
SB = NB // 128  # bucket sublane rows


# ----------------------------------------------------------------------
# shared in-kernel helpers
# ----------------------------------------------------------------------


def _load_pt(ref, idx) -> KernelPoint:
    coords = []
    for ci in range(3):
        coords.append([ref[(*idx, ci, l)] for l in range(NL12)])
    return KernelPoint(*coords)


def _store_pt(ref, idx, p: KernelPoint) -> None:
    for ci, coord in enumerate(p.tree()):
        for l in range(NL12):
            ref[(*idx, ci, l)] = coord[l]


def _shift_up(x: jnp.ndarray, d, rows: int) -> jnp.ndarray:
    """Logical z[i] = x[i - d] over the row-major (rows, 128) layout;
    wrapped-in garbage is masked by callers.  d may be traced."""
    q, rm = d // 128, d % 128
    a = pltpu.roll(x, rm, axis=1)
    b1 = pltpu.roll(a, q, axis=0)
    b2 = pltpu.roll(a, q + 1, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane >= rm, b1, b2)


def _shift_down(x: jnp.ndarray, d, rows: int) -> jnp.ndarray:
    """Logical z[i] = x[i + d]; wrapped-in garbage masked by callers."""
    q, rm = d // 128, d % 128
    a = pltpu.roll(x, (128 - rm) % 128, axis=1)
    b1 = pltpu.roll(a, (rows - q) % rows, axis=0)
    b2 = pltpu.roll(a, (rows - q - 1) % rows, axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    return jnp.where(lane < 128 - rm, b1, b2)


def _map_pt(fn, p: KernelPoint) -> KernelPoint:
    return KernelPoint(*[[fn(l) for l in coord] for coord in p.tree()])


def _select_pt(mask, p: KernelPoint, q: KernelPoint) -> KernelPoint:
    pick = lambda a, b: [jnp.where(mask, x, y) for x, y in zip(a, b)]
    return KernelPoint(pick(p.x, q.x), pick(p.y, q.y), pick(p.z, q.z))


def _pos_iota(rows: int) -> jnp.ndarray:
    return (
        jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    )


# ----------------------------------------------------------------------
# kernel bodies
# ----------------------------------------------------------------------


def _canon_kernel(field_name: str, to_canonical: bool):
    """Montgomery-R16-domain values (repacked to radix 12) -> canonical
    integer limbs (= window digits) when ``to_canonical``, else the
    kernel Montgomery domain a·2^264 (for point coordinates)."""
    kf = KernelField(field_name)
    p = kernel_consts(field_name)["modulus"]
    factor = pow(2, -8, p) if to_canonical else (1 << 256) % p
    f_np = _to_limbs12(factor)

    def kernel(in_ref, out_ref):
        v = [in_ref[l] for l in range(NL12)]
        out = kf.mul(v, _const_list(f_np, v[0]))
        if to_canonical:
            out = kf.cond_sub_p(out)
        for l in range(NL12):
            out_ref[l] = out[l]

    return kernel


def _scan_kernel(base_field: str):
    """Phase 1: sequential segmented run-prefix scan down the R rows."""
    kc = KernelCurve(base_field)

    def kernel(pts_ref, heads_ref, out_ref, acc_ref):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _():
            _store_pt(acc_ref, (), kc.identity(pts_ref[0, 0, 0, 0]))

        p = _load_pt(pts_ref, (0, 0))
        head = heads_ref[0, 0] != 0
        acc = _load_pt(acc_ref, ())
        out = _select_pt(head, p, kc.add(acc, p))
        _store_pt(acc_ref, (), out)
        _store_pt(out_ref, (0, 0), out)

    return kernel


def _colscan_kernel(base_field: str, sl: int):
    """Segmented Hillis–Steele over L = sl*128 column summaries ->
    the carry flowing INTO each column (exclusive, head-bounded)."""
    kc = KernelCurve(base_field)
    L = sl * 128
    levels = max((L - 1).bit_length(), 1)

    def kernel(sums_ref, flags_ref, out_ref):
        v0 = _load_pt(sums_ref, (0,))
        f0 = flags_ref[0]
        idx = _pos_iota(sl)

        def level(k, state):
            vt, f = state
            v = KernelPoint(*vt)
            d = jnp.int32(1) << k
            sv = _map_pt(lambda x: _shift_up(x, d, sl), v)
            sf = _shift_up(f, d, sl)
            comb_v = _select_pt(f != 0, v, kc.add(sv, v))
            comb_f = sf | f
            keep = idx < d
            v = _select_pt(keep, v, comb_v)
            f = jnp.where(keep, f, comb_f)
            return (v.tree(), f)

        vt, _ = jax.lax.fori_loop(0, levels, level, (v0.tree(), f0))
        v = KernelPoint(*vt)
        # carry into column l = inclusive result of column l-1; col 0 none.
        cv = _map_pt(lambda x: _shift_up(x, 1, sl), v)
        cv = _select_pt(idx == 0, kc.identity(cv.x[0]), cv)
        _store_pt(out_ref, (0,), cv)

    return kernel


def _bucket_kernel(base_field: str):
    """B = tails + carries; then T = Σ_b b·B_b via two suffix scans
    (bucket 0 must arrive as the identity)."""
    kc = KernelCurve(base_field)
    levels = C  # log2(NB)

    def kernel(tails_ref, carries_ref, out_ref):
        b = kc.add(_load_pt(tails_ref, (0,)), _load_pt(carries_ref, (0,)))
        idx = _pos_iota(SB)
        ident = kc.identity(b.x[0])

        def level(k, vt):
            vals = KernelPoint(*vt)
            d = jnp.int32(1) << k
            sv = _map_pt(lambda x: _shift_down(x, d, SB), vals)
            sv = _select_pt(idx + d < NB, sv, ident)
            return kc.add(vals, sv).tree()

        s = jax.lax.fori_loop(0, levels, level, b.tree())
        u = jax.lax.fori_loop(0, levels, level, s)
        upt = KernelPoint(*u)
        for ci, coord in enumerate(upt.tree()):
            for l in range(NL12):
                out_ref[0, ci, l] = coord[l][0:8, :]

    return kernel


def _horner_kernel(base_field: str, n_windows: int):
    """acc = Σ_w 2^(cw)·S_w, MSB window first: c doubles then one add per
    window.  Runs on (8, 128) vregs with only element [0, 1] meaningful
    (lanes never mix in the complete formulas; garbage lanes stay 0)."""
    kc = KernelCurve(base_field)

    def kernel(sums_ref, out_ref):
        ident = kc.identity(sums_ref[0, 0, 0])

        def body(w, acct):
            acc = KernelPoint(*jax.lax.fori_loop(
                0, C, lambda _, a: kc.double(KernelPoint(*a)).tree(), acct
            ))
            rows = sums_ref[pl.ds(n_windows - 1 - w, 1)]
            q = KernelPoint(
                *[[rows[0, ci, l] for l in range(NL12)] for ci in range(3)]
            )
            return kc.add(acc, q).tree()

        acc = jax.lax.fori_loop(0, n_windows, body, ident.tree())
        _store_pt(out_ref, (0,), KernelPoint(*acc))

    return kernel


def _shift_gens_kernel(base_field: str, n_windows: int):
    """Fixed-base precompute: out[w] = 2^(cw) · G for each input lane."""
    kc = KernelCurve(base_field)

    def kernel(gens_ref, out_ref):
        def body(w, acct):
            p = KernelPoint(*acct)
            for ci, coord in enumerate(p.tree()):
                for l in range(NL12):
                    out_ref[pl.ds(w, 1), ci, l] = coord[l][None]
            return jax.lax.fori_loop(
                0, C, lambda _, a: kc.double(KernelPoint(*a)).tree(), acct
            )

        jax.lax.fori_loop(0, n_windows, body, _load_pt(gens_ref, ()).tree())

    return kernel


# ----------------------------------------------------------------------
# launch wrappers
# ----------------------------------------------------------------------

_INTERPRET = False  # flipped by tests off-TPU


def _interpret() -> bool:
    return _INTERPRET or jax.default_backend() != "tpu"


def _canon_call(field_name: str, vals12: jnp.ndarray, to_canonical: bool) -> jnp.ndarray:
    """(M, NL12) -> (M, NL12) through the canon kernel (padded to vregs)."""
    m = vals12.shape[0]
    blk = 8 * 128
    m_pad = -(-m // blk) * blk
    x = jnp.pad(vals12, ((0, m_pad - m), (0, 0)))
    x = x.T.reshape(NL12, m_pad // 128, 128)
    spec = pl.BlockSpec(
        (NL12, 8, 128), lambda g: (0, g, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _canon_kernel(field_name, to_canonical),
        grid=(m_pad // blk,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((NL12, m_pad // 128, 128), jnp.int32),
        interpret=_interpret(),
    )(x)
    return out.reshape(NL12, m_pad).T[:m]


def _scan_call(base_field: str, pts, heads, n_win: int, rows: int, sub: int):
    """pts: (n_win, rows, 3, NL12, sub, 128); heads: (n_win, rows, sub, 128)."""
    pspec = pl.BlockSpec(
        (1, 1, 3, NL12, sub, 128),
        lambda w, r: (w, r, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    hspec = pl.BlockSpec(
        (1, 1, sub, 128), lambda w, r: (w, r, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _scan_kernel(base_field),
        grid=(n_win, rows),
        in_specs=[pspec, hspec],
        out_specs=pspec,
        out_shape=jax.ShapeDtypeStruct(pts.shape, jnp.int32),
        scratch_shapes=[pltpu.VMEM((3, NL12, sub, 128), jnp.int32)],
        interpret=_interpret(),
    )(pts, heads)


def _colscan_call(base_field: str, sums, flags, n_win: int, sub: int):
    """sums: (n_win, 3, NL12, sub, 128); flags: (n_win, sub, 128)."""
    sspec = pl.BlockSpec(
        (1, 3, NL12, sub, 128), lambda w: (w, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    fspec = pl.BlockSpec(
        (1, sub, 128), lambda w: (w, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _colscan_kernel(base_field, sub),
        grid=(n_win,),
        in_specs=[sspec, fspec],
        out_specs=sspec,
        out_shape=jax.ShapeDtypeStruct(sums.shape, jnp.int32),
        interpret=_interpret(),
    )(sums, flags)


def _bucket_call(base_field: str, tails, carries, n_win: int):
    """tails/carries: (n_win, 3, NL12, SB, 128) -> (n_win, 3, NL12, 8, 128)."""
    bspec = pl.BlockSpec(
        (1, 3, NL12, SB, 128), lambda w: (w, 0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _bucket_kernel(base_field),
        grid=(n_win,),
        in_specs=[bspec, bspec],
        out_specs=pl.BlockSpec(
            (1, 3, NL12, 8, 128), lambda w: (w, 0, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_win, 3, NL12, 8, 128), jnp.int32),
        interpret=_interpret(),
    )(tails, carries)


def _horner_call(base_field: str, sums, n_windows: int):
    """sums: (n_windows, 3, NL12, 8, 128), LSB window first -> (1, 3, NL12, 8, 128)."""
    return pl.pallas_call(
        _horner_kernel(base_field, n_windows),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 3, NL12, 8, 128), jnp.int32),
        interpret=_interpret(),
    )(sums)


# ----------------------------------------------------------------------
# XLA glue: domains, layouts, sort, scatter
# ----------------------------------------------------------------------


def _pts_to_12(curve: Curve, points: Point) -> jnp.ndarray:
    """(n,17)-coord Point (R16 Montgomery) -> (n, 3, NL12) kernel domain."""
    n = points.x.shape[0]
    stacked = jnp.stack(points, axis=1).reshape(n * 3, -1)  # (3n, 17)
    v12 = repack_16_to_12(stacked)  # value a·2^272 in 12-bit limbs
    conv = _canon_call(curve.params.base_field, v12, to_canonical=False)
    return conv.reshape(n, 3, NL12)


def _pt_from_12(curve: Curve, coords12: jnp.ndarray) -> Point:
    """(3, NL12) kernel domain -> single R16-Montgomery Point."""
    f = curve.field
    from_k = jnp.asarray(int_to_limbs((1 << 280) % f.params.modulus))
    a16 = repack_12_to_16(coords12)  # (3, 17), value a·2^264
    out = f.mul(a16, jnp.broadcast_to(from_k, a16.shape))
    return Point(out[0], out[1], out[2])


def _digits_of_scalars(curve: Curve, scalars_mont: jnp.ndarray) -> jnp.ndarray:
    """(n, 17) Montgomery scalars -> (n, NL12) canonical 12-bit digits."""
    s12 = repack_16_to_12(scalars_mont)
    return _canon_call(curve.params.scalar_field, s12, to_canonical=True)


def _sorted_layout(vals: jnp.ndarray, lanes: int, rows: int) -> jnp.ndarray:
    """(per, ...) position-major -> (rows, ..., S, 128) column-major."""
    arr = vals.reshape(lanes, rows, *vals.shape[1:])  # pos = l*rows + r
    arr = jnp.moveaxis(arr, 0, -1)  # (rows, ..., L)
    return arr.reshape(*arr.shape[:-1], lanes // 128, 128)


def _identity12(base_field: str) -> np.ndarray:
    one = np.asarray(kernel_consts(base_field)["one"], dtype=np.int32)
    out = np.zeros((3, NL12), dtype=np.int32)
    out[1] = one
    return out


def _bucket_accumulate(
    base_field: str,
    pts12_sorted: jnp.ndarray,  # (n_win*per, 3, NL12) kernel domain, digit-sorted
    d_sorted: jnp.ndarray,  # (n_win*per,) int32 digits (ascending per window)
    n_win: int,
    lanes: int,
):
    """Windows -> buckets -> per-window sums (n_win, 3, NL12, 8, 128);
    the window sum is element [.., 0, 1] of each output row."""
    m = pts12_sorted.shape[0]
    per = m // n_win
    rows = per // lanes
    sub = lanes // 128

    d_g = d_sorted.reshape(n_win, per)
    prev = jnp.concatenate([jnp.full((n_win, 1), -1, jnp.int32), d_g[:, :-1]], axis=1)
    nxt = jnp.concatenate([d_g[:, 1:], jnp.full((n_win, 1), -1, jnp.int32)], axis=1)
    heads = (d_g != prev).astype(jnp.int32)
    tails = d_g != nxt

    lay = lambda v: _sorted_layout(v, lanes, rows)
    pts_l = jax.vmap(lay)(pts12_sorted.reshape(n_win, per, 3, NL12))
    heads_l = jax.vmap(lay)(heads)  # (n_win, rows, sub, 128)

    prefix = _scan_call(base_field, pts_l, heads_l, n_win, rows, sub)

    sums = prefix[:, rows - 1]  # (n_win, 3, NL12, sub, 128)
    hcum = jnp.cumsum(heads_l, axis=1)
    flags = (hcum[:, rows - 1] > 0).astype(jnp.int32)
    carries = _colscan_call(base_field, sums, flags, n_win, sub)

    # Compact the <= NB run tails per window BEFORE touching point data:
    # a full-size (per,) scatter/gather of 264-byte rows cost ~100 ms per
    # window; gathering just the NB tail positions is ~50x cheaper.
    ident = jnp.asarray(_identity12(base_field))

    def one_window(prefix_w, hcum_w, carries_w, dg, tl):
        # prefix_w (rows,3,NL12,sub,128); hcum_w (rows,sub,128);
        # carries_w (3,NL12,sub,128); dg/tl (per,)
        cnt = tl.sum()
        tpos = jnp.nonzero(tl, size=NB, fill_value=0)[0]
        valid = jnp.arange(NB) < cnt
        r_i = (tpos % rows).astype(jnp.int32)
        colp = tpos // rows
        s_i = (colp // 128).astype(jnp.int32)
        j_i = (colp % 128).astype(jnp.int32)
        vals = prefix_w[r_i, :, :, s_i, j_i]  # (NB, 3, NL12)
        hc = hcum_w[r_i, s_i, j_i]  # (NB,)
        carry = jnp.moveaxis(carries_w[:, :, s_i, j_i], -1, 0)  # (NB, 3, NL12)
        dgt = dg[tpos]
        base = jnp.broadcast_to(ident, (NB + 1, 3, NL12))
        bidx = jnp.where(valid & (dgt != 0), dgt, NB)
        tails_b = base.at[bidx].set(vals)[:NB]
        cidx = jnp.where(valid & (hc == 0) & (dgt != 0), dgt, NB)
        carries_b = base.at[cidx].set(carry)[:NB]
        to_k = lambda b: b.reshape(SB, 128, 3, NL12).transpose(2, 3, 0, 1)
        return to_k(tails_b), to_k(carries_b)

    tb, cb = jax.vmap(one_window)(prefix, hcum, carries, d_g, tails)
    return _bucket_call(base_field, tb, cb, n_win)


# ----------------------------------------------------------------------
# public entries
# ----------------------------------------------------------------------


def msm_pallas_traceable(
    curve: Curve,
    points: Point,
    scalars_mont: jnp.ndarray,
    lanes: int = 4096,
    window_group: int | None = None,
) -> Point:
    """Variable-base MSM through the Pallas pipeline (one device pass)."""
    base_field = curve.params.base_field
    n = points.x.shape[0]
    n_pad = max(-(-n // lanes) * lanes, lanes)
    digits = _digits_of_scalars(curve, scalars_mont)  # (n, NL12)
    pts12 = _pts_to_12(curve, points)  # (n, 3, NL12)
    if n_pad != n:
        digits = jnp.pad(digits, ((0, n_pad - n), (0, 0)))
        pts12 = jnp.pad(pts12, ((0, n_pad - n), (0, 0), (0, 0)))

    sh = max((n_pad - 1).bit_length(), 1)
    assert C + sh <= 32, "point count too large for uint32 sort keys"
    idx_arr = jnp.arange(n_pad, dtype=jnp.uint32)

    def window_sum_group(dw):  # (g, n_pad) digits for a group of windows
        keys = jnp.sort(
            (dw.astype(jnp.uint32) << sh) | idx_arr[None, :], axis=-1
        )
        order = (keys & ((1 << sh) - 1)).astype(jnp.int32)
        d_s = (keys >> sh).astype(jnp.int32)
        # 2-D row gather (3-D-source gathers lower poorly on TPU)
        pts_s = pts12.reshape(n_pad, 3 * NL12)[order.reshape(-1)].reshape(
            -1, 3, NL12
        )
        return _bucket_accumulate(base_field, pts_s, d_s.reshape(-1), dw.shape[0], lanes)

    group = window_group or (2 if n_pad > (1 << 17) else W)
    n_groups = -(-W // group)
    dig_w = digits.T  # (W, n_pad): limb w IS window w's digit (c = radix)
    pad_w = n_groups * group - W
    if pad_w:  # pad windows are all-zero digits -> identity window sums
        dig_w = jnp.pad(dig_w, ((0, pad_w), (0, 0)))
    grouped = dig_w.reshape(n_groups, group, n_pad)
    if n_groups == 1:
        sums = window_sum_group(grouped[0])[None]
    else:
        sums = jax.lax.map(window_sum_group, grouped)
    sums = sums.reshape(n_groups * group, 3, NL12, 8, 128)[:W]
    total = _horner_call(base_field, sums, W)
    return _pt_from_12(curve, total[0, :, :, 0, 1])


@functools.lru_cache(maxsize=8)
def _msm_pallas_jit(curve_name: str, lanes: int):
    from .point import get_curve
    from ..utils.aotcache import aot_jit

    curve = get_curve(curve_name)
    return aot_jit(
        f"msm_pallas/{curve_name}/{lanes}",
        lambda pts, s: msm_pallas_traceable(curve, pts, s, lanes),
    )


def msm_pallas(curve: Curve, points: Point, scalars_mont: jnp.ndarray) -> Point:
    n = points.x.shape[0]
    lanes = 4096 if n >= 4096 else 1024
    return _msm_pallas_jit(curve.params.name, lanes)(points, scalars_mont)


# -- fixed-base (Pedersen commit) path ---------------------------------


@functools.lru_cache(maxsize=8)
def _shifted_gens12(curve_name: str, n: int) -> jnp.ndarray:
    """(W * n, 3, NL12) kernel-domain table: item w*n+i = 2^(cw)·G_i."""
    from .point import get_curve
    from ..nova.pedersen import commitment_key

    curve = get_curve(curve_name)
    ck = commitment_key(curve_name, n)
    base_field = curve.params.base_field

    def build(gens: Point) -> jnp.ndarray:
        g12 = _pts_to_12(curve, gens)  # (n, 3, NL12)
        blk = 8 * 128
        n_pad = -(-n // blk) * blk
        g12 = jnp.pad(g12, ((0, n_pad - n), (0, 0), (0, 0)))
        gl = g12.transpose(1, 2, 0).reshape(3, NL12, n_pad // 128, 128)
        spec = pl.BlockSpec(
            (3, NL12, 8, 128), lambda g: (0, 0, g, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            _shift_gens_kernel(base_field, W),
            grid=(n_pad // blk,),
            in_specs=[spec],
            out_specs=pl.BlockSpec(
                (W, 3, NL12, 8, 128),
                lambda g: (0, 0, 0, g, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (W, 3, NL12, n_pad // 128, 128), jnp.int32
            ),
            interpret=_interpret(),
        )(gl)
        out = out.reshape(W, 3, NL12, n_pad)[:, :, :, :n]
        return out.transpose(0, 3, 1, 2).reshape(W * n, 3, NL12)

    from ..utils.aotcache import aot_jit

    return aot_jit(f"gens12/{curve_name}/{n}", build)(ck.gens)


def commit_pallas_traceable(
    curve: Curve, gens12: jnp.ndarray, scalars_mont: jnp.ndarray, lanes: int
) -> Point:
    """Fixed-base MSM: one bucket accumulation over W*n pre-shifted items."""
    base_field = curve.params.base_field
    n = scalars_mont.shape[0]
    assert gens12.shape[0] == W * n
    digits = _digits_of_scalars(curve, scalars_mont)  # (n, NL12)
    m = W * n
    m_pad = -(-m // lanes) * lanes
    sh = max((m_pad - 1).bit_length(), 1)
    assert C + sh <= 32, "commit size too large for uint32 sort keys"
    item_idx = jnp.arange(m, dtype=jnp.uint32)
    keys = (digits.T.reshape(-1).astype(jnp.uint32) << sh) | item_idx
    if m_pad != m:  # pad items: digit 0, index 0 (land in the dump row)
        keys = jnp.pad(keys, (0, m_pad - m))
    keys = jnp.sort(keys)
    order = (keys & ((1 << sh) - 1)).astype(jnp.int32)
    d_s = (keys >> sh).astype(jnp.int32)
    pts_s = gens12.reshape(-1, 3 * NL12)[order].reshape(-1, 3, NL12)
    out = _bucket_accumulate(base_field, pts_s, d_s, 1, lanes)
    return _pt_from_12(curve, out[0, :, :, 0, 1])


def commit_pallas_batch_traceable(
    curve: Curve, gens12: jnp.ndarray, scalars_mont: jnp.ndarray, lanes: int
) -> list[Point]:
    """K fixed-base MSMs over the SAME pre-shifted generator table in one
    bucket-accumulation launch: ``scalars_mont`` is (K, n, 17) and each
    row's W*n items become their own "window" of the shared pipeline
    (separate buckets, one point per row).  The IVC prover uses K=2 to
    commit a strict witness and its NIFS cross term in a single
    executable (nova/ivc.py::Side._fold_strict_fn) — the two dispatches
    + device_gets this replaces each cost ~20 ms of remote-tunnel RPC
    per fold (reference per-fold body: src/nova/proof.rs:342-349)."""
    base_field = curve.params.base_field
    k, n = scalars_mont.shape[0], scalars_mont.shape[1]
    assert gens12.shape[0] == W * n
    digits = _digits_of_scalars(
        curve, scalars_mont.reshape(k * n, scalars_mont.shape[2])
    ).reshape(k, n, NL12)
    m = W * n
    m_pad = -(-m // lanes) * lanes
    sh = max((m_pad - 1).bit_length(), 1)
    assert C + sh <= 32, "commit size too large for uint32 sort keys"
    item_idx = jnp.arange(m, dtype=jnp.uint32)
    keys = (
        digits.transpose(0, 2, 1).reshape(k, m).astype(jnp.uint32) << sh
    ) | item_idx[None, :]
    if m_pad != m:  # pad items: digit 0, index 0 (land in the dump row)
        keys = jnp.pad(keys, ((0, 0), (0, m_pad - m)))
    keys = jnp.sort(keys, axis=-1)
    order = (keys & ((1 << sh) - 1)).astype(jnp.int32)
    d_s = (keys >> sh).astype(jnp.int32)
    pts_s = gens12.reshape(-1, 3 * NL12)[order.reshape(-1)].reshape(-1, 3, NL12)
    out = _bucket_accumulate(base_field, pts_s, d_s.reshape(-1), k, lanes)
    return [_pt_from_12(curve, out[j, :, :, 0, 1]) for j in range(k)]


@functools.lru_cache(maxsize=8)
def _commit_pallas_jit(curve_name: str, lanes: int):
    from .point import get_curve

    curve = get_curve(curve_name)
    # gens12 is a jit ARGUMENT, never a closure: captured concrete arrays
    # become XLA constants and constant-folding multi-MB literals wedges
    # the compile (the round-2 lesson, see nova/ivc.py::Side._tables).
    # The canonical (non-Montgomery) coordinate stack rides along in the
    # same executable: the host needs it for the Fiat–Shamir transcript,
    # and a separate decode dispatch costs ~10 ms of tunnel RPC.
    def run(gens12, scalars):
        pt = commit_pallas_traceable(curve, gens12, scalars, lanes)
        canon = curve.field.from_mont(jnp.stack(list(pt)))
        return pt, canon

    from ..utils.aotcache import aot_jit

    return aot_jit(f"commit_pallas/{curve_name}/{lanes}", run)


def commit_pallas(curve_name: str, scalars_mont: jnp.ndarray):
    """Pedersen commit against the cached hash-derived generator key
    (same generators as nova/pedersen.py::commitment_key).

    Returns (projective Point in Montgomery form, canonical (3, 17)
    integer-limb coordinate stack)."""
    n = scalars_mont.shape[0]
    lanes = 4096 if n * W >= 4096 else 1024
    gens12 = _shifted_gens12(curve_name, n)
    return _commit_pallas_jit(curve_name, lanes)(gens12, scalars_mont)
