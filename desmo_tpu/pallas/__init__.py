"""Hand-written TPU kernels for the training hot path."""

from desmo_tpu.pallas.dual_gemm import dual_contractions, factored_mse_fused  # noqa: F401
