"""Poseidon permutation, sponge hash, and random-oracle transcript (JAX).

Batched over leading axes like every field op: a state is a list of
``width`` limb arrays.  Used natively for Nova's Fiat–Shamir transcript
(SURVEY.md §2 D3/D4); the in-circuit (R1CS gadget) form lives in
``r1cs/gadgets.py`` and shares these constants.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import Field, get_field
from .params import ALPHA, FULL_ROUNDS, generate_constants, partial_rounds


class Poseidon:
    """Poseidon-128 permutation over one Pasta field, fixed width."""

    def __init__(self, field: Field, width: int):
        assert width >= 2
        self.field = field
        self.width = width
        self.r_p = partial_rounds(width)
        rc, mds = generate_constants(field.params.name, width)
        enc = lambda v: field.encode(int(v))
        self.rc = [enc(c) for c in rc]  # Montgomery-encoded constants
        self.mds = [[enc(mds[i][j]) for j in range(width)] for i in range(width)]

    def _sbox(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.field
        return f.mul(f.sqr(f.sqr(x)), x)  # x^5

    def _mds_mul(self, state: list) -> list:
        f = self.field
        out = []
        for i in range(self.width):
            acc = f.mul(state[0], jnp.broadcast_to(self.mds[i][0], state[0].shape))
            for j in range(1, self.width):
                acc = f.add(
                    acc, f.mul(state[j], jnp.broadcast_to(self.mds[i][j], state[j].shape))
                )
            # Keep magnitudes bounded for downstream muls.
            out.append(f.partial_reduce(acc, k_max=5))
        return out

    def permute(self, state: list) -> list:
        """Full permutation: R_F/2 full, R_P partial, R_F/2 full rounds."""
        f = self.field
        assert len(state) == self.width
        rc_iter = iter(self.rc)
        add_rc = lambda s: [
            f.add(x, jnp.broadcast_to(next(rc_iter), x.shape)) for x in s
        ]
        half = FULL_ROUNDS // 2
        for _ in range(half):
            state = self._mds_mul([self._sbox(x) for x in add_rc(state)])
        for _ in range(self.r_p):
            state = add_rc(state)
            state = self._mds_mul([self._sbox(state[0])] + state[1:])
        for _ in range(half):
            state = self._mds_mul([self._sbox(x) for x in add_rc(state)])
        return state


@functools.lru_cache(maxsize=64)
def get_poseidon(field_name: str, width: int) -> Poseidon:
    return Poseidon(get_field(field_name), width)


def hash_fixed(field_name: str, inputs: list) -> jnp.ndarray:
    """Fixed-arity hash: domain-tagged single permutation, first element out.

    Domain tag (element 0) is ``2^arity - 1``, matching the constant-
    input-length convention of the neptune-style API.
    """
    arity = len(inputs)
    pos = get_poseidon(field_name, arity + 1)
    f = pos.field
    tag = f.encode((1 << arity) - 1)
    shape = inputs[0].shape
    state = [jnp.broadcast_to(tag, shape)] + list(inputs)
    return pos.permute(state)[0]


class Transcript:
    """Duplex-sponge Fiat–Shamir transcript (Nova's RO equivalent).

    Absorb any number of field elements, then squeeze challenge scalars.
    Rate = width - 1, capacity = 1 (the running state element 0).
    """

    def __init__(self, field_name: str, width: int = 5):
        self.pos = get_poseidon(field_name, width)
        self.rate = width - 1
        self.buf: list = []
        self.state = None

    def absorb(self, *elements: jnp.ndarray) -> None:
        self.buf.extend(elements)

    def _flush(self) -> None:
        f = self.pos.field
        shape = self.buf[0].shape if self.buf else (f.one.shape)
        if self.state is None:
            self.state = [jnp.broadcast_to(f.zero, shape)] * self.pos.width
        buf, self.buf = self.buf, []
        for k in range(0, max(len(buf), 1), self.rate):
            chunk = buf[k : k + self.rate]
            st = list(self.state)
            for j, el in enumerate(chunk):
                st[1 + j] = f.add(st[1 + j], el)
            self.state = self.pos.permute(st)

    def squeeze(self) -> jnp.ndarray:
        """One field element of challenge material."""
        self._flush()
        out = self.state[1]
        # Domain-separate successive squeezes.
        f = self.pos.field
        self.state = [f.add(self.state[0], jnp.broadcast_to(f.one, self.state[0].shape))] + self.state[1:]
        self.buf = []
        return out
