from wekws_tpu.ops.fused_mdtc import (
    extract_mdtc_weights,
    fused_mdtc_forward,
    fused_mdtc_stream,
    init_stream_cache,
)

__all__ = [
    "extract_mdtc_weights",
    "fused_mdtc_forward",
    "fused_mdtc_stream",
    "init_stream_cache",
]
