"""HyperPlonk protocol layer (L4): local baselines + collaborative provers.

Reference parity: /root/reference/hyperplonk/src/{hyperplonk.rs,dhyperplonk.rs}.
"""

from .collaborative import (
    cpermcheck,
    dhyperplonk,
    dhyperplonk_data_parallel,
    dhyperplonk_phased,
    dpermcheck,
)
from .local import LocalInputs, local_hyperplonk, local_hyperplonkpp, local_inputs
from .params import PackedProvingParameters, packed_proving_parameters
from .verify import verify_local_hyperplonk

__all__ = [
    "LocalInputs",
    "verify_local_hyperplonk",
    "PackedProvingParameters",
    "cpermcheck",
    "dhyperplonk",
    "dhyperplonk_data_parallel",
    "dhyperplonk_phased",
    "dpermcheck",
    "local_hyperplonk",
    "local_hyperplonkpp",
    "local_inputs",
    "packed_proving_parameters",
]
