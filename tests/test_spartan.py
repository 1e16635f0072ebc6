"""Spartan component tests (sumcheck, multilinear, IPA) + compressed
pipeline smoke (kept small: CPU-eager point ops dominate runtime)."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from vdf_tpu.fields import FQ, get_field
from vdf_tpu.poseidon import Transcript
from vdf_tpu.spartan import (
    eq_table,
    eval_univariate,
    evaluate,
    ipa_prove,
    ipa_verify,
    num_vars,
    pad_to_pow2,
    sumcheck_prove,
    sumcheck_verify,
)


@pytest.fixture
def f():
    return get_field("Fq")


class TestMultilinear:
    def test_eq_table_matches_direct(self, f):
        p = FQ.modulus
        rs_int = [3, 7]
        rs = [f.encode(v) for v in rs_int]
        table = f.decode(eq_table(f, rs))
        # eq(r, x) for x in {00, 01, 10, 11}; index bit order: top var first
        for idx in range(4):
            bits = [(idx >> 1) & 1, idx & 1]  # [x0 (top), x1]
            want = 1
            for r, b in zip(rs_int, bits):
                want = want * ((r * b + (1 - r) * (1 - b)) % p) % p
            assert table[idx] == want

    def test_evaluate_matches_eq_inner_product(self, f):
        p = FQ.modulus
        rng = random.Random(0)
        vals_int = [rng.randrange(p) for _ in range(8)]
        vals = f.encode(vals_int)
        rs = [f.encode(rng.randrange(p)) for _ in range(3)]
        got = f.decode(evaluate(f, vals, rs))
        table = f.decode(eq_table(f, rs))
        want = sum(v * t for v, t in zip(vals_int, table)) % p
        assert got == want


class TestSumcheck:
    def test_eval_univariate(self, f):
        p = FQ.modulus
        # g(x) = 2 + 3x + x^2 -> evals at 0,1,2
        g = lambda x: (2 + 3 * x + x * x) % p
        evals = [f.encode(g(k)) for k in range(3)]
        r = 123456789
        got = f.decode(eval_univariate(f, evals, f.encode(r)))
        assert got == g(r)

    def test_sumcheck_product_roundtrip(self, f):
        p = FQ.modulus
        rng = random.Random(7)
        n = 8
        a_int = [rng.randrange(p) for _ in range(n)]
        b_int = [rng.randrange(p) for _ in range(n)]
        a, b = f.encode(a_int), f.encode(b_int)
        claim_int = sum(x * y for x, y in zip(a_int, b_int)) % p
        claim = f.encode(claim_int)

        tr = Transcript("Fq")
        tr.absorb(f.encode(1))
        rs, finals, msgs = sumcheck_prove(f, tr, [a, b], 2, "product", claim)

        tr2 = Transcript("Fq")
        tr2.absorb(f.encode(1))
        rs_v, final_claim, ok = sumcheck_verify(f, tr2, msgs, claim, degree=2)
        assert bool(np.all(np.asarray(ok)))
        # final claim must equal a(r)*b(r)
        got = f.decode(f.mul(finals[0], finals[1]))
        assert f.decode(final_claim) == got
        # and a(r) really is the multilinear evaluation
        assert f.decode(finals[0]) == f.decode(evaluate(f, a, rs))

    def test_sumcheck_wrong_claim_rejected(self, f):
        p = FQ.modulus
        a = f.encode([1, 2, 3, 4])
        b = f.encode([5, 6, 7, 8])
        claim = f.encode(999)  # wrong
        tr = Transcript("Fq")
        rs, finals, msgs = sumcheck_prove(f, tr, [a, b], 2, "product", claim)
        tr2 = Transcript("Fq")
        rs_v, _, ok = sumcheck_verify(f, tr2, msgs, claim, degree=2)
        # messages are honest sums, so g(0)+g(1) != claimed 999
        assert not bool(np.all(np.asarray(ok)))


class TestIPA:
    def test_ipa_roundtrip_and_reject(self, f):
        from vdf_tpu.curves import get_curve
        from vdf_tpu.nova.pedersen import commitment_key

        c = get_curve("pallas")
        n = 4
        ck = commitment_key("pallas", n)
        p = FQ.modulus
        rng = random.Random(5)
        a_int = [rng.randrange(p) for _ in range(n)]
        b_int = [rng.randrange(p) for _ in range(n)]
        a, b = f.encode(a_int), f.encode(b_int)
        comm = ck.commit(a)
        v = sum(x * y for x, y in zip(a_int, b_int)) % p

        tr = Transcript("Fq")
        proof = ipa_prove(f, c, ck.gens, ck.h, a, b, tr)
        tr2 = Transcript("Fq")
        assert bool(np.asarray(ipa_verify(f, c, ck.gens, ck.h, comm, b, f.encode(v), proof, tr2)))
        tr3 = Transcript("Fq")
        assert not bool(np.asarray(ipa_verify(
            f, c, ck.gens, ck.h, comm, b, f.encode((v + 1) % p), proof, tr3
        )))
import pytest as _pytest

pytestmark = _pytest.mark.slow  # heavy XLA compiles: slow CI lane
