from .circuit import InverseMinRootCircuit, inverse_round_gadget
from .nifs import NIFS, R1CSInstance, RelaxedInstance, RelaxedWitness
from .pedersen import CommitmentKey, commitment_key
from .r1cs_device import DeviceMatrix, DeviceShape
from .snark import (
    NovaVDFProof,
    PublicParams,
    RecursiveSNARK,
    eval_and_make_circuits,
    public_params,
)
from .ivc import (
    IVCParams,
    IVCProof,
    RecursiveIVC,
    ivc_public_params,
    ivc_verify,
)
from .compressed import CompressedIVCProof, ivc_compress, ivc_verify_compressed
from .pipeline import StatementProof, VDFStatement, prove_stream

__all__ = [
    "InverseMinRootCircuit",
    "inverse_round_gadget",
    "NIFS",
    "R1CSInstance",
    "RelaxedInstance",
    "RelaxedWitness",
    "CommitmentKey",
    "commitment_key",
    "DeviceMatrix",
    "DeviceShape",
    "NovaVDFProof",
    "PublicParams",
    "RecursiveSNARK",
    "eval_and_make_circuits",
    "public_params",
    "IVCParams",
    "IVCProof",
    "RecursiveIVC",
    "ivc_public_params",
    "ivc_verify",
    "CompressedIVCProof",
    "ivc_compress",
    "ivc_verify_compressed",
    "StatementProof",
    "VDFStatement",
    "prove_stream",
]
