"""vdf_tpu: a TPU-native MinRoot VDF + Nova recursive-SNARK framework.

A from-scratch JAX/Pallas/pjit re-design of the capability surface of the
``vdf`` reference crate (MinRoot over the Pasta fields, Nova IVC proving,
Spartan+IPA compression) — arrays-of-limbs field arithmetic, lane-batched
VDF evaluation, and pod-sharded proving math.
"""

__version__ = "0.1.0"
