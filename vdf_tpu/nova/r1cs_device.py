"""Device-side R1CS: sparse matrices on device + batched matvec.

The prover's hot linear algebra (SURVEY.md §3.4): Az, Bz, Cz products
as gather → field-mul → segment-sum over COO entries, fully vectorized
and shardable by constraint rows (SURVEY.md §2.4 TP row).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import Field, NLIMBS
from ..fields.ops import resolve
from ..r1cs.cs import R1CSShape


@dataclasses.dataclass
class DeviceMatrix:
    rows: jnp.ndarray  # (nnz,) int32
    cols: jnp.ndarray  # (nnz,) int32
    vals: jnp.ndarray  # (nnz, 17) Montgomery-encoded coefficients
    num_rows: int

    def matvec(self, field: Field, z: jnp.ndarray) -> jnp.ndarray:
        """M @ z over the field; z: (num_vars, 17) -> (num_rows, 17).

        Limb-wise lazy accumulation: products are < 2p with canonical
        limbs, so uint32 segment sums stay exact and the row value stays
        below ``2p * 2^15`` for up to 2^15 entries per row (enforced at
        ``DeviceShape.build``); one resolve + a k_max=15 partial
        reduction recanonicalizes each row.
        """
        prods = field.mul(self.vals, z[self.cols])
        acc = jax.ops.segment_sum(prods, self.rows, num_segments=self.num_rows)
        return field.partial_reduce(resolve(acc, NLIMBS), k_max=15)


@dataclasses.dataclass
class DeviceShape:
    shape: R1CSShape
    a: DeviceMatrix
    b: DeviceMatrix
    c: DeviceMatrix

    @classmethod
    def build(cls, field: Field, shape: R1CSShape) -> "DeviceShape":
        def mk(coo):
            rows, cols, coeffs = coo
            if len(rows):
                max_nnz = int(np.bincount(np.asarray(rows)).max())
                # matvec's lazy-sum exactness bound (see matvec docstring).
                assert max_nnz <= 1 << 15, f"row nnz {max_nnz} exceeds 2^15"
            vals = field.encode([int(c) for c in coeffs]) if len(coeffs) else jnp.zeros((0, NLIMBS), jnp.uint32)
            return DeviceMatrix(
                jnp.asarray(rows), jnp.asarray(cols), vals, shape.num_cons
            )

        return cls(shape, mk(shape.a_coo), mk(shape.b_coo), mk(shape.c_coo))

    def z_vector(self, field: Field, w: jnp.ndarray, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """z = (W, u, X) per Nova's layout."""
        return jnp.concatenate([w, u[None], x], axis=0)

    def check_relaxed_dev(self, field: Field, w, e, x, u) -> jnp.ndarray:
        """Az ∘ Bz == u·Cz + E — traceable, returns a device bool."""
        z = self.z_vector(field, w, x, u)
        az = self.a.matvec(field, z)
        bz = self.b.matvec(field, z)
        cz = self.c.matvec(field, z)
        lhs = field.mul(az, bz)
        rhs = field.add(field.mul(jnp.broadcast_to(u, cz.shape), cz), e)
        return jnp.all(field.eq(lhs, rhs))

    def check_relaxed(self, field: Field, w, e, x, u) -> bool:
        return bool(jax.device_get(self.check_relaxed_dev(field, w, e, x, u)))

    def cross_term(self, field: Field, z1, u1, z2, u2) -> jnp.ndarray:
        """NIFS cross term:
        T = Az1∘Bz2 + Az2∘Bz1 − u1·Cz2 − u2·Cz1   (SURVEY.md §3.4)."""
        az1, bz1, cz1 = (m.matvec(field, z1) for m in (self.a, self.b, self.c))
        az2, bz2, cz2 = (m.matvec(field, z2) for m in (self.a, self.b, self.c))
        t = field.add(field.mul(az1, bz2), field.mul(az2, bz1))
        t = field.sub(t, field.mul(jnp.broadcast_to(u1, cz2.shape), cz2))
        t = field.sub(t, field.mul(jnp.broadcast_to(u2, cz1.shape), cz1))
        return t
