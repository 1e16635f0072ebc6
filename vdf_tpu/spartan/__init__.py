from .ipa import IPAProof, ipa_prove, ipa_verify
from .multilinear import eq_table, evaluate, fold_top, num_vars, pad_to_pow2
from .snark import SpartanProof, spartan_prove, spartan_verify
from .sumcheck import eval_univariate, sumcheck_prove, sumcheck_verify

__all__ = [
    "IPAProof",
    "ipa_prove",
    "ipa_verify",
    "eq_table",
    "evaluate",
    "fold_top",
    "num_vars",
    "pad_to_pow2",
    "SpartanProof",
    "spartan_prove",
    "spartan_verify",
    "eval_univariate",
    "sumcheck_prove",
    "sumcheck_verify",
]
