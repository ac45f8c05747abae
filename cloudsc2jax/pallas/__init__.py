from .cloudsc2_kernel import (
    Cloudsc2BlockedOutputs,
    cloudsc2_pallas,
    unblock_outputs,
)
from .experiments import (
    EncodedInputs,
    cloudsc2_pallas_encoded,
    cloudsc2_pallas_tlad_fused,
    encode_blocked_inputs,
)
from .tlad_kernel import (
    cloudsc2_pallas_ad,
    cloudsc2_pallas_tl,
)

__all__ = [
    "cloudsc2_pallas",
    "cloudsc2_pallas_tl",
    "cloudsc2_pallas_ad",
    "cloudsc2_pallas_tlad_fused",
    "cloudsc2_pallas_encoded",
    "encode_blocked_inputs",
    "EncodedInputs",
    "Cloudsc2BlockedOutputs",
    "unblock_outputs",
]
