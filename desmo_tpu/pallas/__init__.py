"""Hand-written TPU kernels for the training hot path."""

from desmo_tpu.pallas.dual_gemm import (  # noqa: F401
    dual_contractions,
    factored_mse_fused,
    pad_snapshots,
)
