"""Typed error surface (reference Error enum, /root/reference/src/nova/proof.rs:45-49).

The reference wraps its two dependency error domains:

    pub enum Error { Nova(NovaError), Synthesis(SynthesisError) }

This framework adds a serialization domain (the reference leans on
pasta_curves' ``repr-c`` canonical byte layout, Cargo.toml:17, and never
ships proofs across a process boundary; we do).
"""

from __future__ import annotations


class VDFError(Exception):
    """Base class for all framework errors."""


class SynthesisError(VDFError):
    """Circuit synthesis failed (unsatisfied constraint, missing
    assignment) — bellperson's SynthesisError domain (proof.rs:47)."""


class NovaError(VDFError):
    """Folding/IVC-level failure (mismatched shapes, bad instance,
    unverifiable fold) — nova-snark's NovaError domain (proof.rs:46)."""


class SerializationError(VDFError):
    """Malformed or non-canonical proof bytes."""
