"""Model variants: core DESMO, Fourier-temporal, autoencoder-latent."""

from desmo_tpu.models import desmo  # noqa: F401
