from wekws_tpu.frontend.kaldi import (
    FrontendConfig,
    povey_window,
    hamming_window,
    mel_banks,
    dct_matrix,
    lifter_coeffs,
    num_frames,
    compute_fbank_np,
    compute_mfcc_np,
)
from wekws_tpu.frontend.features import (
    FeatureExtractor,
    frontend_from_dataset_conf,
)
from wekws_tpu.frontend.cmvn import load_cmvn_json, load_cmvn_kaldi, load_cmvn

__all__ = [
    "FrontendConfig",
    "povey_window",
    "hamming_window",
    "mel_banks",
    "dct_matrix",
    "lifter_coeffs",
    "num_frames",
    "compute_fbank_np",
    "compute_mfcc_np",
    "FeatureExtractor",
    "frontend_from_dataset_conf",
    "load_cmvn_json",
    "load_cmvn_kaldi",
    "load_cmvn",
]
