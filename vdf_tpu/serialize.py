"""Canonical byte serialization for proofs and instances.

The reference relies on pasta_curves' ``repr-c`` feature (Cargo.toml:17)
for a canonical little-endian element layout and keeps proofs in-process;
this framework ships proofs across processes/hosts, so every proof object
gets a versioned byte encoding:

  * field elements / scalars: 32-byte little-endian canonical ints
    (the same layout as pasta_curves ``Repr``);
  * points: 1 tag byte (0 = identity, 1 = affine) + x + y;
  * vectors: u64-LE length prefix + elements;
  * every stream starts with an 8-byte magic + format version + a kind
    byte, and decoding checks canonicality (elements < modulus).

Round-trip property: ``deserialize(pp, serialize(pp, proof))`` verifies
identically to the original (tests/test_serialize.py).
"""

from __future__ import annotations

import struct

import jax.numpy as jnp

from .curves import Point, get_curve
from .errors import SerializationError
from .nova.compressed import CompressedIVCProof
from .nova.ivc import HostInstance, HostRelaxedInstance, IVCParams, IVCProof, Side
from .spartan.ipa import IPAProof
from .spartan.snark import SpartanProof

MAGIC = b"VDFTPU01"
KIND_IVC = 1
KIND_COMPRESSED = 2


class _Writer:
    def __init__(self):
        self.parts: list[bytes] = []

    def u8(self, v: int):
        self.parts.append(struct.pack("<B", v))

    def u64(self, v: int):
        self.parts.append(struct.pack("<Q", v))

    def fe(self, v: int):
        if not 0 <= v < (1 << 256):
            raise SerializationError(f"element out of range: {v}")
        self.parts.append(int(v).to_bytes(32, "little"))

    def point(self, aff: tuple | None):
        if aff is None:
            self.u8(0)
        else:
            self.u8(1)
            self.fe(int(aff[0]))
            self.fe(int(aff[1]))

    def fe_vec(self, vs):
        self.u64(len(vs))
        for v in vs:
            self.fe(int(v))

    def bytes(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def take(self, n: int) -> bytes:
        if self.off + n > len(self.data):
            raise SerializationError("truncated stream")
        out = self.data[self.off : self.off + n]
        self.off += n
        return out

    def u8(self) -> int:
        return self.take(1)[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.take(8))[0]

    def fe(self, modulus: int | None = None) -> int:
        v = int.from_bytes(self.take(32), "little")
        if modulus is not None and v >= modulus:
            raise SerializationError("non-canonical field element")
        return v

    def point(self, modulus: int | None = None) -> tuple | None:
        tag = self.u8()
        if tag == 0:
            return None
        if tag != 1:
            raise SerializationError(f"bad point tag {tag}")
        return (self.fe(modulus), self.fe(modulus))

    def fe_vec(self, modulus: int | None = None) -> list[int]:
        n = self.u64()
        if n > len(self.data):  # cheap bomb guard
            raise SerializationError("vector length exceeds stream")
        return [self.fe(modulus) for _ in range(n)]

    def done(self):
        if self.off != len(self.data):
            raise SerializationError("trailing bytes")


# ---------------------------------------------------------------------
# instances
# ---------------------------------------------------------------------


NUM_IO = 2  # both augmented circuits expose exactly two public inputs


def _check_len(what: str, got: int, want: int):
    if got != want:
        raise SerializationError(f"{what}: length {got}, expected {want}")


def _w_strict(w: _Writer, u: HostInstance):
    w.point(u.comm_w)
    w.fe_vec(u.X)


def _r_strict(r: _Reader, side: Side) -> HostInstance:
    u = HostInstance(
        r.point(_base_mod(side)), r.fe_vec(side.field.params.modulus)
    )
    _check_len("strict instance X", len(u.X), NUM_IO)
    return u


def _w_relaxed(w: _Writer, U: HostRelaxedInstance):
    w.point(U.comm_w)
    w.point(U.comm_e)
    w.fe_vec(U.X)
    w.fe(U.u)


def _r_relaxed(r: _Reader, side: Side) -> HostRelaxedInstance:
    base_mod = _base_mod(side)
    scalar_mod = side.field.params.modulus
    U = HostRelaxedInstance(
        r.point(base_mod),
        r.point(base_mod),
        r.fe_vec(scalar_mod),
        r.fe(scalar_mod),
    )
    _check_len("relaxed instance X", len(U.X), NUM_IO)
    return U


def _witness_ints(side: Side, handle) -> list[int]:
    """Witness handle (jnp array on the device plane, int list on the
    host plane) -> canonical ints."""
    if isinstance(handle, (list, tuple)):
        return [int(v) for v in handle]
    out = side.field.decode(handle)
    return out if isinstance(out, list) else [out]


def _witness_handle(side: Side, ints: list[int]):
    if not side.use_device:
        return [int(v) for v in ints]
    return side.field.encode(ints)


def _base_mod(side: Side) -> int:
    """Modulus of the commitment curve's base field (= point coords)."""
    return get_curve(side.curve_name).field.params.modulus


# ---------------------------------------------------------------------
# IVCProof (RecursiveSNARK)
# ---------------------------------------------------------------------


def serialize_ivc_proof(pp: IVCParams, proof: IVCProof) -> bytes:
    w = _Writer()
    w.parts.append(MAGIC)
    w.u8(KIND_IVC)
    w.u64(proof.i)
    w.fe_vec(proof.z0)
    w.fe_vec(proof.z_i)
    _w_relaxed(w, proof.r_U_primary)
    w.fe_vec(_witness_ints(pp.primary, proof.r_W_primary))
    w.fe_vec(_witness_ints(pp.primary, proof.r_E_primary))
    _w_relaxed(w, proof.r_U_secondary)
    w.fe_vec(_witness_ints(pp.secondary, proof.r_W_secondary))
    w.fe_vec(_witness_ints(pp.secondary, proof.r_E_secondary))
    _w_strict(w, proof.l_u_secondary)
    w.fe_vec(_witness_ints(pp.secondary, proof.l_w_secondary))
    return w.bytes()


def deserialize_ivc_proof(pp: IVCParams, data: bytes) -> IVCProof:
    r = _Reader(data)
    if r.take(8) != MAGIC or r.u8() != KIND_IVC:
        raise SerializationError("bad magic/kind")
    p_mod = pp.primary.field.params.modulus
    s_mod = pp.secondary.field.params.modulus
    i = r.u64()
    z0 = r.fe_vec(p_mod)
    z_i = r.fe_vec(p_mod)
    _check_len("z0", len(z0), pp.arity)
    _check_len("z_i", len(z_i), pp.arity)

    def _wvec(side: Side, mod: int, n: int, what: str):
        """Witness vectors feed jitted kernels whose gathers clamp
        out-of-range indices silently — wrong-length decodes must fail
        closed HERE, not evaluate a distorted relation downstream."""
        vs = r.fe_vec(mod)
        _check_len(what, len(vs), n)
        return _witness_handle(side, vs)

    n_aux_p, n_cons_p = pp.primary.shape.num_aux, pp.primary.shape.num_cons
    n_aux_s, n_cons_s = pp.secondary.shape.num_aux, pp.secondary.shape.num_cons
    U_p = _r_relaxed(r, pp.primary)
    W_p = _wvec(pp.primary, p_mod, n_aux_p, "primary W")
    E_p = _wvec(pp.primary, p_mod, n_cons_p, "primary E")
    U_s = _r_relaxed(r, pp.secondary)
    W_s = _wvec(pp.secondary, s_mod, n_aux_s, "secondary W")
    E_s = _wvec(pp.secondary, s_mod, n_cons_s, "secondary E")
    l_u = _r_strict(r, pp.secondary)
    l_w = _wvec(pp.secondary, s_mod, n_aux_s, "secondary l_w")
    r.done()
    return IVCProof(i, z0, z_i, U_p, W_p, E_p, U_s, W_s, E_s, l_u, l_w)


# ---------------------------------------------------------------------
# SpartanProof / IPAProof (device arrays <-> ints via the side's field)
# ---------------------------------------------------------------------


def _point_ints(side: Side, pt) -> tuple | None:
    c = get_curve(side.curve_name)
    return c.to_affine_ints(Point(*(jnp.asarray(v)[None] for v in pt)))[0]


def _point_dev(side: Side, aff: tuple | None) -> Point:
    c = get_curve(side.curve_name)
    if aff is None:
        return c.identity(())
    pt = c.from_affine_ints([aff])
    return Point(*(v[0] for v in pt))


def _fe_int(side: Side, arr) -> int:
    out = side.field.decode(arr)
    return out if isinstance(out, int) else out[0]


def _w_ipa(w: _Writer, side: Side, ipa: IPAProof):
    w.u64(len(ipa.ls))
    for pt in ipa.ls:
        w.point(_point_ints(side, pt))
    for pt in ipa.rs:
        w.point(_point_ints(side, pt))
    w.fe(_fe_int(side, ipa.a_final))


def _r_ipa(r: _Reader, side: Side) -> IPAProof:
    n = r.u64()
    bm, sm = _base_mod(side), side.field.params.modulus
    ls = tuple(_point_dev(side, r.point(bm)) for _ in range(n))
    rs = tuple(_point_dev(side, r.point(bm)) for _ in range(n))
    return IPAProof(ls, rs, side.field.encode(r.fe(sm)))


def _w_spartan(w: _Writer, side: Side, sp: SpartanProof):
    for msgs in (sp.sc1_messages, sp.sc2_messages):
        w.u64(len(msgs))
        for evals in msgs:
            w.u64(len(evals))
            for e in evals:
                w.fe(_fe_int(side, e))
    for v in (sp.vA, sp.vB, sp.vC, sp.vE, sp.vW):
        w.fe(_fe_int(side, v))
    _w_ipa(w, side, sp.ipa_e)
    _w_ipa(w, side, sp.ipa_w)


def _r_spartan(r: _Reader, side: Side) -> SpartanProof:
    f, sm = side.field, side.field.params.modulus

    def msgs():
        n = r.u64()
        if n > 64:
            raise SerializationError("too many sumcheck rounds")
        out = []
        for _ in range(n):
            k = r.u64()
            if k > 8:
                raise SerializationError("sumcheck message too long")
            out.append([f.encode(r.fe(sm)) for _ in range(k)])
        return tuple(out)

    sc1 = msgs()
    sc2 = msgs()
    vA, vB, vC, vE, vW = (f.encode(r.fe(sm)) for _ in range(5))
    return SpartanProof(sc1, vA, vB, vC, vE, sc2, vW, _r_ipa(r, side), _r_ipa(r, side))


# ---------------------------------------------------------------------
# CompressedIVCProof
# ---------------------------------------------------------------------


def serialize_compressed(pp: IVCParams, proof: CompressedIVCProof) -> bytes:
    w = _Writer()
    w.parts.append(MAGIC)
    w.u8(KIND_COMPRESSED)
    w.u64(proof.i)
    w.fe_vec(proof.z0)
    w.fe_vec(proof.z_i)
    _w_relaxed(w, proof.r_U_primary)
    _w_relaxed(w, proof.r_U_secondary)
    _w_strict(w, proof.l_u_secondary)
    w.point(proof.comm_t_final)
    _w_spartan(w, pp.primary, proof.spartan_primary)
    _w_spartan(w, pp.secondary, proof.spartan_secondary)
    return w.bytes()


def deserialize_compressed(pp: IVCParams, data: bytes) -> CompressedIVCProof:
    r = _Reader(data)
    if r.take(8) != MAGIC or r.u8() != KIND_COMPRESSED:
        raise SerializationError("bad magic/kind")
    p_mod = pp.primary.field.params.modulus
    i = r.u64()
    z0 = r.fe_vec(p_mod)
    z_i = r.fe_vec(p_mod)
    _check_len("z0", len(z0), pp.arity)
    _check_len("z_i", len(z_i), pp.arity)
    U_p = _r_relaxed(r, pp.primary)
    U_s = _r_relaxed(r, pp.secondary)
    l_u = _r_strict(r, pp.secondary)
    comm_t = r.point(_base_mod(pp.secondary))
    sp_p = _r_spartan(r, pp.primary)
    sp_s = _r_spartan(r, pp.secondary)
    r.done()
    return CompressedIVCProof(i, z0, z_i, U_p, U_s, l_u, comm_t, sp_p, sp_s)
