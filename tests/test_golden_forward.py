"""Golden numerics: the shipped trained checkpoints driven through our JAX
forward must match an independent PyTorch implementation of the documented
model semantics (SURVEY §2.5) evaluated on the same imported parameters.

This exercises realistic trained magnitudes — omega ~ 1e4 inside sin/cos is
the precision-sensitive regime SURVEY §7 flags — rather than random values.
The flow data is not shipped, so POD modes are synthesized orthonormal
vectors; the contract checked is functional equivalence, not the logged error.
"""

import glob
import os

import numpy as np
import pytest

import jax.numpy as jnp

from desmo_tpu import checkpoint
from desmo_tpu.models import desmo, fourier

torch = pytest.importorskip("torch")
REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)


def random_orthonormal(n, r, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, r)))
    return q.astype(np.float32)


def torch_desmo_forward(sd, pod_modes, poly_order):
    """Vectorized torch implementation of the documented forward semantics
    (modes = mask * POD; library in combinations_with_replacement order;
    recon = c*Theta @ Z + sum of coef * f(omega*phi) outer z)."""
    import itertools

    r = sum(1 for k in sd if k.startswith("phi_list."))
    phi = torch.stack([sd[f"phi_list.{i}"] for i in range(r)], dim=1)  # (n, r)
    latent = torch.as_tensor(pod_modes) * phi
    n = latent.shape[0]
    cols = [torch.ones(n)]
    for d in range(1, poly_order + 1):
        for tup in itertools.combinations_with_replacement(range(r), d):
            col = torch.ones(n)
            for v in tup:
                col = col * latent[:, v]
            cols.append(col)
    theta = torch.stack(cols, dim=1)
    c = sd["c_coef"]
    T = theta.shape[1]
    z = torch.stack([sd[f"z_list.{t}"] for t in range(T)])
    recon = (c * theta) @ z
    funcs = [torch.sin, torch.cos, torch.tanh]
    kinds = ["sin", "cos", "tanh"]
    for i in range(r):
        for k in range(3):
            omega = sd[f"omega_list.{3 * i + k}"]
            coef = sd[f"{kinds[k]}_coef_list.{i}"]
            zk = sd[f"z{kinds[k]}_list.{i}"]
            recon = recon + coef * torch.outer(funcs[k](omega * latent[:, i]), zk)
    return recon, latent


def load_golden(path):
    sd_np = checkpoint.load_pt(path)
    sd_t = {k: torch.tensor(v) for k, v in sd_np.items()}
    return sd_np, sd_t


@pytest.mark.parametrize(
    "rel,poly_order",
    [
        ("DESMO/cylinder_flow/DESMO_r4_final_2025-01-25_17-08-31.pt", 3),
        ("DESMO/aneurysm/DESMO_r4_final_2025-01-27_19-06-26.pt", 2),
        ("DESMO/turbulent_channel/DESMO_r4_final_2025-04-15_15-44-04.pt", 2),
        ("DESMO-SR/cylinder_flow/DESMO_r2_final_2025-01-27_20-41-11.pt", 2),
    ],
)
def test_desmo_checkpoints_forward_parity(rel, poly_order):
    path = os.path.join(REFERENCE, rel)
    sd_np, sd_t = load_golden(path)
    params = checkpoint.params_from_state_dict(sd_np, "desmo")
    r, n = params["phi"].shape
    m = params["z"].shape[1]
    pod_modes = random_orthonormal(n, r, seed=1)

    spec = desmo.DesmoSpec(n=n, m=m, r=r, poly_order=poly_order)
    assert spec.num_poly_terms == params["c"].shape[0], "polyorder inference"

    recon, latent, _ = desmo.apply(params, jnp.asarray(pod_modes), spec)
    recon_t, latent_t = torch_desmo_forward(sd_t, pod_modes, poly_order)

    np.testing.assert_allclose(
        np.asarray(latent), latent_t.numpy(), rtol=1e-5, atol=1e-6
    )
    scale = np.abs(recon_t.numpy()).max() + 1e-30
    err = np.abs(np.asarray(recon) - recon_t.numpy()).max() / scale
    assert err < 5e-5, f"forward mismatch {err:.2e} for {rel}"


@pytest.mark.parametrize(
    "rel,m",
    [
        # m from each case's DESMO.out:2 ("Data matrix X is n by m")
        ("DESMO_Fourier/cylinder_flow/DESMOCF_r2_final_2025-02-11_16-45-07.pt", 1001),
        # hardest trig-precision regime of the shipped set: nF=30, period~1000
        ("DESMO_Fourier/aneurysm/DESMOFourier_r2_final_2025-02-05_03-17-57.pt", 1000),
    ],
)
def test_fourier_checkpoint_forward_parity(rel, m):
    path = os.path.join(REFERENCE, rel)
    sd_np, sd_t = load_golden(path)
    params = checkpoint.params_from_state_dict(sd_np, "fourier")
    r, n = params["phi"].shape
    ncoef = params["z"].shape[1]
    nF = (ncoef - 1) // 2
    pod_modes = random_orthonormal(n, r, seed=2)

    spec = fourier.FourierSpec(n=n, m=m, r=r, poly_order=2, n_fourier=nF)
    recon, latent, z = fourier.apply(params, jnp.asarray(pod_modes), spec)

    # torch oracle in float64: at trained periods the series angles reach
    # ~1e3 rad, where fp32 trig argument reduction differs between torch and
    # XLA by O(1e-3); the float64 oracle isolates OUR fp32 error.
    t = torch.linspace(0, m, m, dtype=torch.float64)

    def series(coeffs, period):
        coeffs = coeffs.double()
        period = period.double()
        out = coeffs[0] * torch.ones_like(t)
        for k in range(1, nF + 1):
            ang = 2 * torch.pi * k * t / period
            out = out + coeffs[2 * k - 1] * torch.cos(ang) + coeffs[2 * k] * torch.sin(ang)
        return out

    T = params["c"].shape[0]
    z_t = torch.stack(
        [series(sd_t[f"z_list.{i}"], sd_t[f"period_list.{i}"]) for i in range(T)]
    )
    z_err = np.abs(np.asarray(z) - z_t.numpy()).max() / (np.abs(z_t.numpy()).max() + 1e-30)
    assert z_err < 5e-3, f"series mismatch {z_err:.2e}"

    import itertools

    phi = torch.stack([sd_t[f"phi_list.{i}"] for i in range(r)], dim=1).double()
    latent_t = torch.as_tensor(pod_modes).double() * phi
    cols = [torch.ones(n, dtype=torch.float64)]
    for d in range(1, 3):
        for tup in itertools.combinations_with_replacement(range(r), d):
            col = torch.ones(n, dtype=torch.float64)
            for v in tup:
                col = col * latent_t[:, v]
            cols.append(col)
    theta = torch.stack(cols, dim=1)
    recon_t = (sd_t["c_coef"].double() * theta) @ z_t
    funcs = [torch.sin, torch.cos, torch.tanh]
    kinds = ["sin", "cos", "tanh"]
    for i in range(r):
        for k in range(3):
            omega = sd_t[f"omega_list.{3 * i + k}"].double()
            coef = sd_t[f"{kinds[k]}_coef_list.{i}"].double()
            zk = series(sd_t[f"z{kinds[k]}_list.{i}"], sd_t[f"trig_period_list.{3 * i + k}"])
            recon_t = recon_t + coef * torch.outer(funcs[k](omega * latent_t[:, i]), zk)

    scale = np.abs(recon_t.numpy()).max() + 1e-30
    err = np.abs(np.asarray(recon) - recon_t.numpy()).max() / scale
    assert err < 5e-3, f"fourier forward mismatch {err:.2e}"
