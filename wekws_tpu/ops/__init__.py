from wekws_tpu.ops.fused_mdtc import (
    extract_mdtc_weights,
    fused_mdtc_forward,
)

__all__ = ["extract_mdtc_weights", "fused_mdtc_forward"]
