"""Poseidon permutation, sponge hash, and random-oracle transcript (JAX).

Batched over leading axes like every field op: a state is a list of
``width`` limb arrays.  Used natively for Nova's Fiat–Shamir transcript
(SURVEY.md §2 D3/D4); the in-circuit (R1CS gadget) form lives in
``r1cs/gadgets.py`` and shares these constants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import Field, get_field
from .params import ALPHA, FULL_ROUNDS, generate_constants, partial_rounds


class Poseidon:
    """Poseidon-128 permutation over one Pasta field, fixed width.

    Compiled as three ``lax.scan``s over rounds (full/partial/full) with
    the round constants as scanned inputs, so the permutation costs a
    few hundred HLO ops regardless of round count — critical because
    transcripts appear inside large jitted prover/verifier graphs.
    """

    def __init__(self, field: Field, width: int):
        assert width >= 2
        self.field = field
        self.width = width
        self.r_p = partial_rounds(width)
        rc, mds = generate_constants(field.params.name, width)
        n_rounds = FULL_ROUNDS + self.r_p
        self.rc = field.encode(list(rc)).reshape(n_rounds, width, -1)
        # mds[i][j] stacked as (w, w, 17) Montgomery constants.
        self.mds = field.encode(
            [mds[i][j] for i in range(width) for j in range(width)]
        ).reshape(width, width, -1)

    def _sbox(self, x: jnp.ndarray) -> jnp.ndarray:
        f = self.field
        return f.mul(f.sqr(f.sqr(x)), x)  # x^5

    def _mds_mul(self, state: jnp.ndarray) -> jnp.ndarray:
        """state: (w, ..., 17) -> (w, ..., 17): one batched field mul plus
        a lazy limb sum per output row."""
        f = self.field
        w = self.width
        batch = state.shape[1:-1]
        mds = self.mds.reshape(self.mds.shape[:2] + (1,) * len(batch) + (-1,))
        prods = f.mul(jnp.broadcast_to(state[None], (w,) + state.shape), mds)
        acc = jnp.sum(prods.astype(jnp.uint32), axis=1)  # (w, ..., 17)
        from ..fields.ops import resolve
        from ..fields import NLIMBS

        return f.partial_reduce(resolve(acc, NLIMBS), k_max=8)

    def permute_array(self, state: jnp.ndarray) -> jnp.ndarray:
        """state: (w, ..., 17) -> same; shape-keyed cached jit so eager
        transcript traffic reuses one executable."""
        return _permute_jit(self.field.params.name, self.width, tuple(state.shape))(
            state
        )

    def _permute_array_traced(self, state: jnp.ndarray) -> jnp.ndarray:
        f = self.field
        w = self.width
        assert state.shape[0] == w
        half = FULL_ROUNDS // 2
        rc = self.rc
        if state.ndim > 2:  # broadcast rc over batch dims
            rc = rc.reshape(rc.shape[:2] + (1,) * (state.ndim - 2) + (rc.shape[-1],))

        def full_round(s, rc_row):
            s = f.partial_reduce(f.add(s, jnp.broadcast_to(rc_row, s.shape)), k_max=2)
            return self._mds_mul(self._sbox(s)), None

        def partial_round(s, rc_row):
            s = f.partial_reduce(f.add(s, jnp.broadcast_to(rc_row, s.shape)), k_max=2)
            s0 = self._sbox(s[0:1])
            s = jnp.concatenate([s0, s[1:]], axis=0)
            return self._mds_mul(s), None

        state, _ = jax.lax.scan(full_round, state, rc[:half])
        state, _ = jax.lax.scan(partial_round, state, rc[half : half + self.r_p])
        state, _ = jax.lax.scan(full_round, state, rc[half + self.r_p :])
        return state

    def permute(self, state: list) -> list:
        """List-of-arrays facade over permute_array."""
        out = self.permute_array(jnp.stack(state))
        return [out[k] for k in range(self.width)]


@functools.lru_cache(maxsize=64)
def get_poseidon(field_name: str, width: int) -> Poseidon:
    return Poseidon(get_field(field_name), width)


@functools.lru_cache(maxsize=None)
def _permute_jit(field_name: str, width: int, shape: tuple):
    pos = get_poseidon(field_name, width)
    return jax.jit(pos._permute_array_traced)


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
        self.field_name = field_name
        self.rate = width - 1
        self.buf: list = []
        self.state = None

    # -- explicit state (for carrying a transcript across jit boundaries) --

    def export_state(self):
        """(state tuple, buffered tuple) of arrays — a jit-able pytree.
        Call only at protocol points (any time is fine; buffers ride along)."""
        return (
            tuple(self.state) if self.state is not None else (),
            tuple(self.buf),
        )

    @classmethod
    def from_state(cls, field_name: str, exported, width: int = 5) -> "Transcript":
        tr = cls(field_name, width)
        state, buf = exported
        tr.state = list(state) if state else None
        tr.buf = list(buf)
        return tr

    def absorb(self, *elements: jnp.ndarray) -> None:
        self.buf.extend(elements)

    def flush(self) -> None:
        """Absorb any buffered elements into the state now.  Keeps the
        exported pytree structure uniform across jit boundaries."""
        if self.buf or self.state is None:
            self._flush()

    def _flush(self) -> None:
        f = self.pos.field
        shape = self.buf[0].shape if self.buf else (f.one.shape)
        if self.state is None:
            self.state = [jnp.broadcast_to(f.zero, shape)] * self.pos.width
        buf, self.buf = self.buf, []
        for k in range(0, max(len(buf), 1), self.rate):
            chunk = buf[k : k + self.rate]
            st = list(self.state)
            # Length/padding tag into the capacity element: distinguishes
            # absorbing zeros from absorbing nothing and full chunks from
            # partial ones (duplex pad-10*-equivalent).
            st[0] = f.add(
                st[0], jnp.broadcast_to(f.encode(len(chunk) + 1), st[0].shape)
            )
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
