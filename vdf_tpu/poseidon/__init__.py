from .params import ALPHA, FULL_ROUNDS, generate_constants, partial_rounds
from .permutation import Poseidon, Transcript, get_poseidon, hash_fixed

__all__ = [
    "ALPHA",
    "FULL_ROUNDS",
    "generate_constants",
    "partial_rounds",
    "Poseidon",
    "Transcript",
    "get_poseidon",
    "hash_fixed",
]
