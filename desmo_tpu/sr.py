"""Post-hoc dynamical-system identification: fit dz/dt = f(z) to the trained
temporal coefficients, integrate, and inject the simulated dynamics back into
the model (reference DESMO-SR, ``DESMO-SR/cylinder_flow/
DESMO-Cylinder-ReadAndInference-DynamicalSystemsFit.py:1005-1452``; SURVEY §2.9).

The reference uses PySINDy's STLSQ (threshold 0.005, alpha 0.05, max_iter 5000,
``...py:1020-1051``) and optionally PySR genetic regression via a Julia
subprocess (``...py:1120-1134``). Neither ships in this environment, so the
sparse-regression core (sequentially thresholded ridge least squares over a
polynomial library) is implemented here directly — it is ~40 lines of linear
algebra — and PySR is an optional import behind ``fit_pysr`` that raises a
clear error when absent. Everything here is host-side NumPy/SciPy by design:
it runs once after training on (m, k) matrices with k ~ 5.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import numpy as np

from desmo_tpu import library


# ---------------------------------------------------------------------------
# Derivatives
# ---------------------------------------------------------------------------


def finite_difference(z: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Second-order central differences (forward/backward at the ends) —
    matching ``np.gradient``, which the reference uses for the PySR targets
    (``...py:1076-1106``) and which PySINDy's default FiniteDifference equals
    on uniform grids."""
    return np.gradient(z, t, axis=0)


# ---------------------------------------------------------------------------
# SINDy: polynomial library + STLSQ
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SINDyModel:
    """dz/dt = Theta(z) @ coefficients.T over a polynomial library."""

    coefficients: np.ndarray  # (k, T)
    degree: int
    feature_names: list[str]

    def theta(self, z: np.ndarray) -> np.ndarray:
        z2 = np.atleast_2d(z)
        cols = [np.ones(len(z2))]
        for tup in library._term_tuples(z2.shape[1], self.degree)[1:]:
            col = np.ones(len(z2))
            for v in tup:
                col = col * z2[:, v]
            cols.append(col)
        return np.stack(cols, axis=1)

    def rhs(self, z: np.ndarray) -> np.ndarray:
        return (self.theta(z) @ self.coefficients.T).reshape(np.shape(z))

    def equations(self, precision: int = 4) -> list[str]:
        """Human-readable fitted equations, e.g. ``dz1/dt = 0.92 z2 - 0.01``."""
        eqs = []
        for i, row in enumerate(self.coefficients):
            terms = [
                f"{c:+.{precision}g} {name}".replace(" 1", "") if name == "1"
                else f"{c:+.{precision}g} {name}"
                for c, name in zip(row, self.feature_names)
                if c != 0.0
            ]
            eqs.append(f"dz{i + 1}/dt = " + (" ".join(terms) if terms else "0"))
        return eqs


def _stlsq(
    theta: np.ndarray, dzdt: np.ndarray, threshold: float, alpha: float, max_iter: int
) -> np.ndarray:
    """Sequentially thresholded ridge regression (PySINDy STLSQ semantics):
    ridge-solve on the active set, zero coefficients with |w| < threshold,
    repeat until the support stabilizes."""
    n_targets = dzdt.shape[1]
    n_feat = theta.shape[1]
    coef = np.zeros((n_targets, n_feat))
    gram = theta.T @ theta + alpha * np.eye(n_feat)

    for i in range(n_targets):
        active = np.ones(n_feat, dtype=bool)
        w = np.linalg.solve(gram, theta.T @ dzdt[:, i])
        for _ in range(max_iter):
            small = np.abs(w) < threshold
            w[small] = 0.0
            new_active = active & ~small
            if new_active.sum() == 0:
                active = new_active
                break
            th = theta[:, new_active]
            g = th.T @ th + alpha * np.eye(new_active.sum())
            w_act = np.linalg.solve(g, th.T @ dzdt[:, i])
            w = np.zeros(n_feat)
            w[new_active] = w_act
            if (new_active == active).all():
                break
            active = new_active
        coef[i] = w
    return coef


def fit_sindy(
    z: np.ndarray,
    t: np.ndarray,
    degree: int = 1,
    threshold: float = 0.005,
    alpha: float = 0.05,
    max_iter: int = 5000,
    dzdt: Optional[np.ndarray] = None,
) -> SINDyModel:
    """Fit dz/dt = f(z) with the reference's configuration
    (``PolynomialLibrary(degree=1)`` + ``STLSQ(0.005, 0.05, 5000)``,
    ``...py:1020-1035``)."""
    z = np.asarray(z, np.float64)
    if dzdt is None:
        dzdt = finite_difference(z, np.asarray(t, np.float64))
    names = library.poly_term_names(z.shape[1], degree, var="z")
    # evaluate library
    tmp = SINDyModel(np.zeros((z.shape[1], len(names))), degree, names)
    theta = tmp.theta(z)
    coef = _stlsq(theta, np.asarray(dzdt, np.float64), threshold, alpha, max_iter)
    return SINDyModel(coef, degree, names)


def simulate(
    model_rhs: Callable[[np.ndarray], np.ndarray] | SINDyModel,
    z0: np.ndarray,
    t: np.ndarray,
    rtol: float = 1e-6,
    atol: float = 1e-8,
) -> np.ndarray:
    """Integrate dz/dt = f(z) with RK45 over t (``solve_ivp``, ``...py:1228-1280``)."""
    from scipy.integrate import solve_ivp

    rhs = model_rhs.rhs if isinstance(model_rhs, SINDyModel) else model_rhs
    sol = solve_ivp(
        lambda _t, zz: np.asarray(rhs(zz)).reshape(-1),
        (float(t[0]), float(t[-1])),
        np.asarray(z0, np.float64).reshape(-1),
        t_eval=np.asarray(t, np.float64),
        method="RK45",
        rtol=rtol,
        atol=atol,
    )
    if not sol.success:
        raise RuntimeError(f"integration failed: {sol.message}")
    return sol.y.T  # (m, k)


# ---------------------------------------------------------------------------
# Channel extraction / injection on a trained DESMO model
# ---------------------------------------------------------------------------

Channel = tuple[str, int] | tuple[str, tuple[int, int]]
"""('poly', t) selects z[t]; ('sin'|'cos'|'tanh', i) selects z_trig[kind, i]."""

_KIND_INDEX = {"sin": 0, "cos": 1, "tanh": 2}

# The channels the reference extracts from its r=2 cylinder run after
# sparsification: z2, zsin0, ztanh0, zsin1, ztanh1 (``...py:986-990``).
REFERENCE_CYLINDER_CHANNELS: list[Channel] = [
    ("poly", 2),
    ("sin", 0),
    ("tanh", 0),
    ("sin", 1),
    ("tanh", 1),
]


def extract_channels(params: dict, channels: Sequence[Channel]) -> np.ndarray:
    """Stack the selected temporal-coefficient vectors into Z (m, k)
    (``...py:986-1011``)."""
    cols = []
    for kind, idx in channels:
        if kind == "poly":
            cols.append(np.asarray(params["z"][idx]))
        else:
            cols.append(np.asarray(params["z_trig"][_KIND_INDEX[kind], idx]))
    return np.stack(cols, axis=1)


def active_channels(energies, threshold: float) -> list[Channel]:
    """Channels whose term energy survives a threshold — the systematic
    version of the reference's hand-picked index list."""
    out: list[Channel] = []
    for t, e in enumerate(np.asarray(energies.poly)):
        if e >= threshold:
            out.append(("poly", t))
    kinds = ("sin", "cos", "tanh")
    trig = np.asarray(energies.trig)
    for i in range(trig.shape[1]):
        for k in range(3):
            if trig[k, i] >= threshold:
                out.append((kinds[k], i))
    return out


def inject_channels(
    params: dict, channels: Sequence[Channel], z_sim: np.ndarray
) -> dict:
    """Overwrite the selected temporal coefficients with simulated trajectories
    (``with torch.no_grad(): model.z_list[i].data = ...``, ``...py:1350-1362``)."""
    import jax.numpy as jnp

    z = np.asarray(params["z"]).copy()
    z_trig = np.asarray(params["z_trig"]).copy()
    for j, (kind, idx) in enumerate(channels):
        if kind == "poly":
            z[idx] = z_sim[:, j]
        else:
            z_trig[_KIND_INDEX[kind], idx] = z_sim[:, j]
    return dict(params, z=jnp.asarray(z), z_trig=jnp.asarray(z_trig))


# ---------------------------------------------------------------------------
# Full pipeline (the DESMO-SR script end to end, ...py:986-1391)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SRResult:
    channels: list  # extracted Channel selections
    model: SINDyModel
    z_data: np.ndarray  # (m, k) extracted trajectories
    z_sim: np.ndarray  # (m, k) integrated trajectories
    params_injected: dict
    error_original: float
    error_simulated: float
    equations: list[str]


def identify_and_reinject(
    params: dict,
    batch: dict,
    spec,
    channels: Optional[Sequence[Channel]] = None,
    energy_threshold: float = 1.0,
    degree: int = 1,
    stlsq_threshold: float = 0.005,
    stlsq_alpha: float = 0.05,
    t: Optional[np.ndarray] = None,
    log: Optional[Callable[[str], None]] = None,
) -> SRResult:
    """The DESMO-SR pipeline on a trained (plain-variant) model:

    1. pick the active temporal channels (explicitly, like the reference's
       hand-picked z2/zsin/ztanh list, or by term energy);
    2. fit dz/dt = f(z) with STLSQ over a polynomial library (...py:1020-1035);
    3. integrate from z(0) with RK45 (...py:1228-1280);
    4. inject the simulated trajectories back into the model and report the
       reconstruction error before/after (...py:1350-1391).
    """
    import jax.numpy as jnp

    from desmo_tpu import losses as losses_mod
    from desmo_tpu import sparsify
    from desmo_tpu.models import desmo as desmo_model

    if channels is None:
        energies = sparsify.term_energies(params, spec=spec)
        channels = active_channels(energies, energy_threshold)
    if not channels:
        raise ValueError("no active channels selected")
    z_data = extract_channels(params, channels)
    m = z_data.shape[0]
    if t is None:
        t = np.arange(m, dtype=np.float64)

    model = fit_sindy(
        z_data, t, degree=degree, threshold=stlsq_threshold, alpha=stlsq_alpha
    )
    if log is not None:
        for eq in model.equations():
            log(eq)
    z_sim = simulate(model, z_data[0], t)

    injected = inject_channels(params, channels, z_sim.astype(np.float32))
    x = jnp.asarray(batch["x"])
    recon0, _, _ = desmo_model.apply(params, batch["pod_modes"], spec)
    recon1, _, _ = desmo_model.apply(injected, batch["pod_modes"], spec)
    err0 = float(losses_mod.relative_frobenius_error(x, recon0))
    err1 = float(losses_mod.relative_frobenius_error(x, recon1))
    if log is not None:
        log(f"error with trained z(t): {err0:.6f}")
        log(f"error with simulated dynamics: {err1:.6f}")
    return SRResult(
        channels=list(channels),
        model=model,
        z_data=z_data,
        z_sim=z_sim,
        params_injected=injected,
        error_original=err0,
        error_simulated=err1,
        equations=model.equations(),
    )


# ---------------------------------------------------------------------------
# Optional PySR (genetic symbolic regression) — reference ...py:1120-1134
# ---------------------------------------------------------------------------


def fit_pysr(z: np.ndarray, dzdt: np.ndarray, **overrides):
    """Genetic symbolic regression of dz/dt (requires the optional ``pysr``
    package + Julia). Configured like the reference: +,-,*,/ binary ops, sin
    unary, nesting/complexity constraints, squared-error loss."""
    try:
        from pysr import PySRRegressor
    except ImportError as exc:  # pragma: no cover - optional dependency
        raise ImportError(
            "PySR is not installed; DESMO-SR's genetic-regression stage is "
            "optional. Use fit_sindy for the STLSQ path, or install pysr."
        ) from exc
    kwargs = dict(
        niterations=10_000,
        binary_operators=["+", "-", "*", "/"],
        unary_operators=["sin"],
        constraints={"add": 10, "mul": 10, "sin": 5},
        nested_constraints={"sin": {"sin": 0}},
        elementwise_loss="loss(x, y) = (x - y)^2",
    )
    kwargs.update(overrides)
    model = PySRRegressor(**kwargs)  # pragma: no cover
    model.fit(z, dzdt)  # pragma: no cover
    return model  # pragma: no cover
