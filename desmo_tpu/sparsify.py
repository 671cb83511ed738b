"""Sparsification and interpretability: term energies, threshold sweeps,
greedy pruning, symbolic reporting (reference L7, SURVEY §2.7).

Every candidate term contributes a rank-1 space-time field
``c_t * theta_t(x) z_t(s)^T``; its "energy" is that field's Frobenius norm
(``DESMO/cylinder_flow/DESMO-Cylinder.py:624-692``, ``poly_norm`` /
``nonlinear_norm``). Because the field is rank-1 the norm factorizes:

    ||c * (u v^T)||_F = |c| * ||u||_2 * ||v||_2

so all T + 3r energies are column norms — no (n, m) outer products, unlike
the reference which materializes one (n, m) field per term.

Sweeps zero the sparsity coefficients (c / c_trig) whose term energy falls
below a threshold, re-infer, and report relative error + nonzero term count
(``CYL:1184-1307``). Greedy pruning (turbulent channel,
``DESMO/turbulent_channel/DESMO-TurbulentChannel.py:1166-1245``) removes terms
one at a time in ascending-energy order.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from desmo_tpu import library, losses
from desmo_tpu.models import desmo as desmo_model
from desmo_tpu.models import fourier as fourier_model


@dataclasses.dataclass(frozen=True)
class TermEnergies:
    poly: np.ndarray  # (T,)
    trig: np.ndarray  # (3, r) kind-major (sin, cos, tanh)

    def interleaved_trig(self) -> np.ndarray:
        """Reference ordering: sin(phi1), cos(phi1), tanh(phi1), sin(phi2)...
        (the order ``nonlinear_norm`` appends, ``CYL:687-689``)."""
        return np.asarray(self.trig).T.reshape(-1)


def _temporal_blocks(params: dict, spec) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(z (T, m), z_trig (3, r, m)) with Fourier series materialized if needed."""
    if "period" in params:  # Fourier variant
        t = jnp.asarray(fourier_model.t_points(spec.m))
        return fourier_model.temporal_values(params, t)
    return params["z"], params["z_trig"]


def term_energies(params: dict, latent_override=None, spec=None) -> TermEnergies:
    """Energies for every candidate term of a trained model.

    Reference quirk preserved: ``poly_norm``/``nonlinear_norm`` evaluate the
    library and trig bases on the RAW phi masks (``param.data``, ``CYL:626-628,
    656-657``) — NOT on the POD-scaled effective modes the forward pass uses.
    The sweep tables in the shipped logs are defined by this convention, so we
    match it. For the AE variant (no 'phi' masks) pass the encoder latent as
    ``latent_override``.
    """
    if latent_override is not None:
        latent = jnp.asarray(latent_override)
    else:
        latent = params["phi"].T  # raw masks (n, r)
    factors = library.factor_table(latent.shape[1], spec.poly_order)
    theta = library.eval_library(latent, factors)  # (n, T)
    z, z_trig = _temporal_blocks(params, spec)
    if "period" in params:
        # Faithfully reproduced reference bug (DESMO_Fourier/*/...py:673,680):
        # the Fourier poly_norm stacks the series as (T, m) but slices COLUMNS
        # as if it were (m, T), so term i's temporal factor is the time-slice
        # zs[:, i] (all T series at timestep i), not series i. The shipped
        # sweep tables are defined by this convention (test_golden_sweep).
        T = params["c"].shape[0]
        z_norm = jnp.linalg.norm(z[:, :T], axis=0)  # norm over zs[:, i] per term i
    else:
        z_norm = jnp.linalg.norm(z, axis=1)
    poly = jnp.abs(params["c"]) * jnp.linalg.norm(theta, axis=0) * z_norm
    basis = desmo_model.trig_basis(latent, params["omega"])  # (3, r, n)
    trig = (
        jnp.abs(params["c_trig"])
        * jnp.linalg.norm(basis, axis=2)
        * jnp.linalg.norm(z_trig, axis=2)
    )
    return TermEnergies(poly=np.asarray(poly), trig=np.asarray(trig))


def mask_inactive_trig(energies: TermEnergies, spec) -> TermEnergies:
    """Zero the energies of trig kinds the model's forward pass masks out of
    the reconstruction (``AESpec.include_tanh=False``, the reference's AE
    tanh exclusion, ``DESMO_AE/...py:709-712``).

    The masked kinds' coefficients never train (the mask zeroes their
    gradient exactly), so their raw init-ones energies can dominate the
    table — ``~|1| * ||tanh(omega*latent)|| * sqrt(m)`` is far above any
    selection threshold at real scale — while the channels are
    mathematically guaranteed to contribute nothing. Channel SELECTION
    (``sr.active_channels`` / ``sr.top_channels``) must see them as dead or
    they crowd real channels out of a capped selection and feed constant
    columns into STLSQ. The threshold-sweep tables keep the RAW energies
    (that is the reference's own convention, pinned by test_golden_sweep).
    """
    if getattr(spec, "include_tanh", True):
        return energies
    trig = np.asarray(energies.trig).copy()
    trig[2, :] = 0.0
    return TermEnergies(poly=np.asarray(energies.poly), trig=trig)


def zero_below_threshold(params: dict, energies: TermEnergies, threshold: float) -> dict:
    """Zero sparsity coefficients whose term energy < threshold (``CYL:1228-1238``)."""
    out = dict(params)
    out["c"] = jnp.where(jnp.asarray(energies.poly) < threshold, 0.0, params["c"])
    out["c_trig"] = jnp.where(jnp.asarray(energies.trig) < threshold, 0.0, params["c_trig"])
    return out


def zero_coefficients_below(
    params: dict, threshold: float, include_tanh: bool = True
) -> dict:
    """Raw-magnitude thresholding of the sparsity coefficients themselves —
    the AE and SR scripts' convention (``DESMO_AE/...py:1153-1163`` with
    threshold 2e-4 and tanh excluded; ``DESMO-SR/...py:1460-1538`` sweep)."""
    out = dict(params)
    out["c"] = jnp.where(jnp.abs(params["c"]) < threshold, 0.0, params["c"])
    ct = jnp.where(jnp.abs(params["c_trig"]) < threshold, 0.0, params["c_trig"])
    if not include_tanh:  # AE: tanh coefficients left untouched
        ct = ct.at[2].set(params["c_trig"][2])
    out["c_trig"] = ct
    return out


def coefficient_sweep(
    params: dict,
    batch: dict,
    spec,
    variant: str = "ae",
    thresholds: Optional[Sequence[float]] = None,
    include_tanh: bool = True,
    log: Optional[Callable[[str], None]] = None,
) -> list[SweepEntry]:
    """Threshold sweep over raw coefficient magnitudes (the SR script's grid
    ``10^-i, i in arange(8, 2, -0.5)`` by default, ``DESMO-SR/...py:1460``)."""
    if thresholds is None:
        thresholds = default_thresholds(8.0, 2.0)
    err_fn = _recon_error_fn(spec, variant)
    results = []
    for threshold in thresholds:
        pruned = zero_coefficients_below(params, float(threshold), include_tanh)
        error = float(err_fn(pruned, batch))
        count = nonzero_terms(pruned)
        results.append(SweepEntry(float(threshold), error, count))
        if log is not None:
            log(f"Threshold: {threshold}, Error: {error:.6f}, Nonzero Terms: {count}")
    return results


def nonzero_terms(params: dict) -> int:
    """Count of surviving terms (``CYL:1260-1265``)."""
    return int(np.sum(np.asarray(params["c"]) != 0)) + int(
        np.sum(np.asarray(params["c_trig"]) != 0)
    )


def default_thresholds(lo: float = 4.0, hi: float = -3.0, step: float = -0.5) -> np.ndarray:
    """``10^-i for i in arange(lo, hi, step)`` — the cylinder sweep grid
    (``CYL:1213``); Fourier runs use wider grids (arange(6,-5) / (5,-5))."""
    return np.asarray([10.0 ** (-i) for i in np.arange(lo, hi, step)])


@dataclasses.dataclass
class SweepEntry:
    threshold: float
    error: float
    nonzero_terms: int


def _recon_error_fn(spec, variant: str):
    """Jitted relative-error evaluator shared across sweep points."""

    if variant == "fourier":
        def recon(params, batch):
            r, _, _ = fourier_model.apply(params, batch["pod_modes"], spec)
            return r
    elif variant == "ae":
        from desmo_tpu.models import autoencoder as ae_model

        def recon(params, batch):
            r, _, _, _ = ae_model.apply(params, batch["x"], spec)
            return r
    else:
        def recon(params, batch):
            r, _, _ = desmo_model.apply(params, batch["pod_modes"], spec)
            return r

    @jax.jit
    def err(params, batch):
        return losses.relative_frobenius_error(batch["x"], recon(params, batch))

    return err


def threshold_sweep(
    params: dict,
    batch: dict,
    spec,
    variant: str = "desmo",
    thresholds: Optional[Sequence[float]] = None,
    energies: Optional[TermEnergies] = None,
    log: Optional[Callable[[str], None]] = None,
) -> list[SweepEntry]:
    """Reproduce the reference's threshold table (``CYL:1217-1307``)."""
    if thresholds is None:
        thresholds = default_thresholds()
    if energies is None:
        latent = None
        if variant == "ae":
            from desmo_tpu.models import autoencoder as ae_model

            latent, _ = ae_model.encode_decode(params, jnp.asarray(batch["x"]))
        energies = term_energies(params, latent_override=latent, spec=spec)
    err_fn = _recon_error_fn(spec, variant)
    results = []
    for threshold in thresholds:
        pruned = zero_below_threshold(params, energies, float(threshold))
        error = float(err_fn(pruned, batch))
        count = nonzero_terms(pruned)
        results.append(SweepEntry(float(threshold), error, count))
        if log is not None:
            log(f"Threshold: {threshold}, Error: {error:.6f}, Nonzero Terms: {count}")
    if log is not None:
        log("\nSummary of Results:")
        log(f"{'Threshold':<10} {'Error':<15} {'Nonzero Terms':<15}")
        for e in results:
            log(f"{e.threshold:<10.1e} {e.error:<15.6f} {e.nonzero_terms:<15}")
    return results


def greedy_order(energies: TermEnergies) -> list[tuple[float, str, object]]:
    """Ascending-energy removal order, with the reference's exact tie-breaking:
    entries are appended poly-first in index order, then per-latent
    (sin, cos, tanh) interleaved, and Python's stable sort preserves insertion
    order among equal energies (``...TurbulentChannel.py:1173-1190``)."""
    order: list[tuple[float, str, object]] = []
    for t, e in enumerate(energies.poly):
        order.append((float(e), "poly", t))
    r = energies.trig.shape[1]
    for i in range(r):
        for k in range(3):
            order.append((float(energies.trig[k, i]), "trig", (k, i)))
    order.sort(key=lambda x: x[0])
    return order


def greedy_prune(
    params: dict,
    batch: dict,
    spec,
    variant: str = "desmo",
    energies: Optional[TermEnergies] = None,
    log: Optional[Callable[[str], None]] = None,
) -> list[SweepEntry]:
    """Remove terms one at a time in ascending-energy order, re-inferring at
    each step (channel script, ``...TurbulentChannel.py:1166-1245``).
    Entry k of the result has the k lowest-energy terms removed."""
    if energies is None:
        energies = term_energies(params, spec=spec)
    order = greedy_order(energies)

    err_fn = _recon_error_fn(spec, variant)
    results = []
    c0 = np.asarray(params["c"]).copy()
    ct0 = np.asarray(params["c_trig"]).copy()
    for step in range(len(order) + 1):
        c = c0.copy()
        ct = ct0.copy()
        for _, kind, idx in order[:step]:
            if kind == "poly":
                c[idx] = 0.0
            else:
                ct[idx] = 0.0
        pruned = dict(params, c=jnp.asarray(c), c_trig=jnp.asarray(ct))
        error = float(err_fn(pruned, batch))
        count = nonzero_terms(pruned)
        results.append(SweepEntry(float(step), error, count))
        if log is not None:
            log(f"Step: {step}, Error: {error:.6f}, Nonzero Terms: {count}")
    return results


def describe_nonzero_terms(params: dict, spec, var: str = "phi") -> list[tuple[str, float]]:
    """Symbolic (name, coefficient) pairs for surviving terms — the
    interpretability dump (``...TurbulentChannel.py:1268-1302``)."""
    r = params["c_trig"].shape[1]
    names = library.poly_term_names(r, spec.poly_order, var)
    out = []
    c = np.asarray(params["c"])
    for t, name in enumerate(names):
        if c[t] != 0:
            out.append((name, float(c[t])))
    ct = np.asarray(params["c_trig"])
    tnames = library.trig_term_names(r, var)
    for j, name in enumerate(tnames):
        k, i = divmod(j, r)
        if ct[k, i] != 0:
            out.append((name, float(ct[k, i])))
    return out
