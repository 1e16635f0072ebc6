"""Proof-carrying checkpoints: persist / resume an IVC chain.

The reference's ``Evaluation::append`` (/root/reference/src/minroot.rs:
428-438) is its implicit checkpointing primitive — any prefix proof plus
a continuation proof compose with verification at the seam.  Nova's
``RecursiveSNARK`` is resumable by construction (prove_step takes the
previous SNARK, /root/reference/src/nova/proof.rs:316, 342-349).  This
module makes both explicit files:

  * an IVC checkpoint IS a serialized ``IVCProof`` (the prover's whole
    state: running accumulators, dangling instance, step counter, z_i) —
    so every checkpoint is independently *verifiable* before resuming,
    and a corrupted/tampered file fails closed in the codec or verifier,
    never inside the prover;
  * a VDF checkpoint is the (state, t) pair behind ``Evaluation.append``.

A killed prover restarts with ``load_ivc`` + ``RecursiveIVC.resume`` and
produces byte-identical proofs to an uninterrupted run
(tests/test_checkpoint.py).
"""

from __future__ import annotations

import os
import struct

from .errors import SerializationError
from .minroot.vdf import State
from .nova.ivc import IVCParams, IVCProof, RecursiveIVC, ivc_verify
from .serialize import deserialize_ivc_proof, serialize_ivc_proof

_MAGIC_IVC = b"VDFTPU/CKPT/IVC1"
_MAGIC_VDF = b"VDFTPU/CKPT/VDF1"


# ---------------------------------------------------------------------
# IVC prover checkpoints
# ---------------------------------------------------------------------


def save_ivc(path: str, pp: IVCParams, prover_or_proof) -> None:
    """Write a checkpoint (atomically: temp file + rename)."""
    proof = (
        prover_or_proof.proof()
        if isinstance(prover_or_proof, RecursiveIVC)
        else prover_or_proof
    )
    body = serialize_ivc_proof(pp, proof)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(_MAGIC_IVC + struct.pack("<Q", len(body)) + body)
    os.replace(tmp, path)


def load_ivc(path: str, pp: IVCParams) -> IVCProof:
    """Read + decode a checkpoint (fail-closed on any malformation)."""
    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[: len(_MAGIC_IVC)] != _MAGIC_IVC:
        raise SerializationError("not an IVC checkpoint file")
    (n,) = struct.unpack_from("<Q", blob, len(_MAGIC_IVC))
    body = blob[len(_MAGIC_IVC) + 8 :]
    if len(body) != n:
        raise SerializationError("truncated IVC checkpoint")
    return deserialize_ivc_proof(pp, body)


def resume_ivc(
    path: str, pp: IVCParams, verify: bool = True, debug: bool = False
) -> RecursiveIVC:
    """Load a checkpoint and return a live prover continuing from it.

    ``verify=True`` (default) runs the O(1) verifier on the checkpoint
    first, so a corrupted or forged file is rejected before any proving
    work builds on it.
    """
    proof = load_ivc(path, pp)
    if verify and not ivc_verify(pp, proof, proof.i, proof.z0, proof.z_i):
        raise SerializationError("checkpoint failed verification")
    return RecursiveIVC.resume(pp, proof, debug=debug)


# ---------------------------------------------------------------------
# plain-VDF (Evaluation.append) checkpoints
# ---------------------------------------------------------------------


def save_vdf(path: str, field_name: str, state: "State", t: int) -> None:
    """Persist an Evaluation segment boundary: (state, total t so far)."""
    from .fields import get_field

    f = get_field(field_name)
    xs, ys, is_ = (f.decode(a) for a in (state.x, state.y, state.i))
    if isinstance(xs, int):
        xs, ys, is_ = [xs], [ys], [is_]
    lanes = len(xs)
    buf = [
        _MAGIC_VDF,
        struct.pack("<Q", t),
        struct.pack("<B", {"Fq": 0, "Fp": 1}[field_name]),
        struct.pack("<Q", lanes),
    ]
    for vs in (xs, ys, is_):
        buf.extend(int(v).to_bytes(32, "little") for v in vs)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(b"".join(buf))
    os.replace(tmp, path)


def load_vdf(path: str) -> tuple[str, "State", int]:
    """-> (field_name, State, t)."""
    from .fields import get_field

    with open(path, "rb") as fh:
        blob = fh.read()
    if blob[: len(_MAGIC_VDF)] != _MAGIC_VDF:
        raise SerializationError("not a VDF checkpoint file")
    off = len(_MAGIC_VDF)
    (t,) = struct.unpack_from("<Q", blob, off)
    off += 8
    (fid,) = struct.unpack_from("<B", blob, off)
    off += 1
    (lanes,) = struct.unpack_from("<Q", blob, off)
    off += 8
    field_name = {0: "Fq", 1: "Fp"}[fid]
    f = get_field(field_name)
    p = f.params.modulus
    if len(blob) != off + 3 * lanes * 32:
        raise SerializationError("truncated VDF checkpoint")

    def vec():
        nonlocal off
        out = []
        for _ in range(lanes):
            v = int.from_bytes(blob[off : off + 32], "little")
            if v >= p:
                raise SerializationError("non-canonical field element")
            out.append(v)
            off += 32
        return f.encode(out)

    x, y, i = vec(), vec(), vec()
    return field_name, State(x, y, i), t
