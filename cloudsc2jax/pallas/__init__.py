from .cloudsc2_kernel import (
    Cloudsc2BlockedOutputs,
    EncodedInputs,
    cloudsc2_pallas,
    cloudsc2_pallas_encoded,
    encode_blocked_inputs,
    unblock_outputs,
)
from .tlad_kernel import (
    cloudsc2_pallas_ad,
    cloudsc2_pallas_tl,
    cloudsc2_pallas_tlad_fused,
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
