"""Hand-written TPU kernels for the training hot path."""

from desmo_tpu.pallas.dual_gemm import (  # noqa: F401
    dual_contractions,
    dual_contractions_split,
    factored_mse_fused,
    factored_mse_fused_split,
    pad_snapshots,
    split_snapshots,
)
