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


def stabilize_linear(model: SINDyModel) -> SINDyModel:
    """Project a degree-1 system's linear part onto the stable half-plane
    (stabilized-DMD-style): eigenvalues with Re > 0 are clamped to Re = 0,
    frequencies (Im) untouched.

    A marginally-unstable STLSQ fit — common when the trained z(t) are not
    perfect oscillations — grows exp(Re·t) over a long forecast horizon and
    lands at inf. Forecasting is the only consumer that integrates far past
    the data, so only the forecasting path applies this; identification
    reports keep the raw fit. Returns the model unchanged when it is already
    stable or the eigenbasis is too ill-conditioned to project through."""
    if model.degree != 1:
        raise ValueError("stabilize_linear needs a degree-1 (linear) system")
    A = model.coefficients[:, 1:]
    lam, V = np.linalg.eig(A)
    clamped = np.where(lam.real > 0.0, 1j * lam.imag, lam)
    if np.allclose(clamped, lam):
        return model
    # A NEAR-defective eigenbasis (nearly coincident eigenvalues, nearly
    # parallel eigenvectors — common for marginally damped fitted
    # oscillators) passes np.linalg.inv but amplifies the eigenvalue
    # perturbation by cond(V): finite-but-garbage A_stab whose non-normal
    # transients can be worse than the raw fit. Keep the raw fit instead.
    if not np.all(np.isfinite(V)) or np.linalg.cond(V) > 1e8:
        return model
    try:
        A_stab = np.real(V @ np.diag(clamped) @ np.linalg.inv(V))
    except np.linalg.LinAlgError:  # exactly defective eigenbasis
        return model
    if not np.all(np.isfinite(A_stab)):
        return model
    coef = model.coefficients.copy()
    coef[:, 1:] = A_stab
    return SINDyModel(
        coefficients=coef, degree=1, feature_names=list(model.feature_names)
    )


def top_channels(
    energies, max_channels: int, threshold: float = 1.0
) -> list[Channel]:
    """The threshold-surviving channels, capped at the ``max_channels``
    HIGHEST-ENERGY ones (canonical channel order preserved).

    The identified system's dimensionality is its stability frontier: the
    reference's SR leg works on 5 of 12 channels at r=2 (``...py:986-990``),
    while an uncapped rich model can pass dozens of channels whose fitted
    system is numerically unstable under integration (runaway trajectories,
    inf forecast error). Used by ``runner.run(holdout=...)``'s chained
    desmo forecast with ``max_channels = 3r``."""
    ch = active_channels(energies, threshold)
    if len(ch) <= max_channels:
        return ch
    kinds = ("sin", "cos", "tanh")
    flat = {("poly", t): float(e) for t, e in enumerate(np.asarray(energies.poly))}
    trig = np.asarray(energies.trig)
    for i in range(trig.shape[1]):
        for k in range(3):
            flat[(kinds[k], i)] = float(trig[k, i])
    keep = set(sorted(ch, key=lambda c: -flat[c])[:max_channels])
    return [c for c in ch if c in keep]


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
# Symbolic-regression equation tables (PySR semantics, engine-agnostic)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class EquationCandidate:
    """One row of a symbolic-regression hall-of-fame table (PySR's
    ``equations_`` DataFrame row: 'equation', 'score', 'complexity', 'loss')."""

    equation: str  # sympy-parseable expression over the channel variable names
    score: float
    complexity: int = 0
    loss: float = float("nan")


def channel_names(channels: Sequence[Channel], spec) -> list[str]:
    """Reference-consistent variable names for selected channels: the flat
    index into the conceptual [z_0..z_{T-1}, sin0, cos0, tanh0, sin1, ...]
    stack — the reference's hand-picked run names its r=2 channels
    z2, z6, z8, z9, z11 this way (``...py:986-990, 1243-1246``)."""
    T = spec.num_poly_terms
    names = []
    for kind, idx in channels:
        if kind == "poly":
            names.append(f"z{idx}")
        else:
            names.append(f"z{T + 3 * idx + _KIND_INDEX[kind]}")
    return names


def _as_candidates(table) -> list[EquationCandidate]:
    """Accept a list of EquationCandidate, dicts, or a pandas DataFrame with
    'equation'/'score' columns (PySR's per-target ``equations_`` table)."""
    if hasattr(table, "iterrows"):  # pandas DataFrame
        return [
            EquationCandidate(
                equation=str(row["equation"]),
                score=float(row["score"]),
                complexity=int(row.get("complexity", 0)),
                loss=float(row.get("loss", float("nan"))),
            )
            for _, row in table.iterrows()
        ]
    out = []
    for c in table:
        if isinstance(c, EquationCandidate):
            out.append(c)
        else:
            out.append(EquationCandidate(**dict(c)))
    return out


def equation_tables_from_pysr(model) -> list[list[EquationCandidate]]:
    """Convert a fitted multi-target ``PySRRegressor`` into plain candidate
    tables (``model_SR.equations_`` is a list of DataFrames for multi-target
    fits, ``...py:1204-1216``)."""
    tables = model.equations_
    if hasattr(tables, "iterrows"):  # single-target fit: one DataFrame
        tables = [tables]
    return [_as_candidates(t) for t in tables]


def select_equations(
    tables: Sequence,
    second_best_for: Sequence[int] = (),
) -> list[str]:
    """Score-based equation selection, exactly the reference's two recipes
    (``...py:1196-1226``): per target, take the HIGHEST-score equation; for
    target indices in ``second_best_for`` take the second-highest-score one
    when it exists (the reference hand-picks targets 1 and 4 this way when the
    best equation over-fits)."""
    chosen = []
    for i, table in enumerate(tables):
        cands = _as_candidates(table)
        if not cands:
            raise ValueError(f"empty equation table for target {i}")
        ranked = sorted(cands, key=lambda c: c.score, reverse=True)
        if i in second_best_for and len(ranked) > 1:
            chosen.append(ranked[1].equation)
        else:
            chosen.append(ranked[0].equation)
    return chosen


def lambdify_system(
    equations: Sequence[str], var_names: Sequence[str]
) -> Callable[[np.ndarray], np.ndarray]:
    """sympy-lambdify the selected equations into one vector ODE RHS
    (``create_function`` + ``discovered_ode_system``, ``...py:1228-1260``)."""
    import sympy

    syms = sympy.symbols(list(var_names))
    funcs = [
        sympy.lambdify(syms, sympy.sympify(eq), modules="numpy")
        for eq in equations
    ]

    def rhs(z: np.ndarray) -> np.ndarray:
        vals = [np.asarray(f(*np.asarray(z, np.float64)), np.float64) for f in funcs]
        return np.stack([np.broadcast_to(v, ()) for v in vals]).reshape(-1)

    return rhs


# ---------------------------------------------------------------------------
# Full pipeline (the DESMO-SR script end to end, ...py:986-1391)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SRResult:
    channels: list  # extracted Channel selections
    model: Optional[SINDyModel]  # None for the PySR engine
    z_data: np.ndarray  # (m, k) extracted trajectories
    z_sim: np.ndarray  # (m, k) integrated trajectories
    params_injected: dict
    error_original: float
    error_simulated: float
    equations: list[str]
    # the fitted dz/dt right-hand side (callable z -> dz/dt) — the handle
    # `forecast` integrates past the training window
    rhs: Optional[Callable] = None


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
    engine: str = "stlsq",
    equation_tables: Optional[Sequence] = None,
    second_best_for: Sequence[int] = (),
    pysr_kwargs: Optional[dict] = None,
    gp_kwargs: Optional[dict] = None,
    recon_fn: Optional[Callable] = None,
) -> SRResult:
    """The DESMO-SR pipeline on a trained (plain-variant) model:

    1. pick the active temporal channels (explicitly, like the reference's
       hand-picked z2/zsin/ztanh list, or by term energy);
    2. fit dz/dt = f(z) — ``engine='stlsq'``: STLSQ over a polynomial library
       (...py:1020-1035); ``engine='pysr'``: genetic symbolic regression with
       score-based equation selection (...py:1116-1226) — pass a fitted
       result via ``equation_tables`` (per-target candidate tables, e.g.
       :func:`equation_tables_from_pysr`) or let it call :func:`fit_pysr`;
       ``engine='gp'``: the SAME genetic-regression contract with the
       built-in engine (``desmo_tpu.gp`` — no Julia/PySR needed; reference
       operator set and constraints, PySR-style score tables);
       ``second_best_for`` lists target indices that take the second-highest-
       score equation, like the reference's hand-picked targets 1 and 4;
    3. integrate from z(0) with RK45 (...py:1228-1280);
    4. inject the simulated trajectories back into the model and report the
       reconstruction error before/after (...py:1350-1391).

    ``recon_fn`` (optional): ``params -> (n, m') reconstruction`` — the
    model's forward pass on an (injected) parameter dict, where ``m'``
    follows the temporal blocks' column count. Defaults to the plain-desmo
    forward (``desmo_model.apply`` on ``batch['pod_modes']``); the AE
    variant passes a closure over its FROZEN encoder latent (the latent is
    a spatial map computed from the training window — the dictionary
    ``A(latent)`` is time-independent, so only the temporal matrix changes
    under injection; see ``runner.run(holdout=...)``).
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

    model: Optional[SINDyModel] = None
    if engine in ("pysr", "gp"):
        names = channel_names(channels, spec)
        if equation_tables is None:
            dzdt = finite_difference(
                np.asarray(z_data, np.float64), np.asarray(t, np.float64)
            )
            if engine == "gp":
                from desmo_tpu import gp as gp_mod

                equation_tables = gp_mod.fit_gp(
                    z_data, dzdt, variable_names=names, log=log,
                    **(gp_kwargs or {}),
                )
            else:  # pragma: no cover - needs Julia
                fitted = fit_pysr(
                    z_data, dzdt, variable_names=names, **(pysr_kwargs or {})
                )
                equation_tables = equation_tables_from_pysr(fitted)
        eq_strings = select_equations(equation_tables, second_best_for)
        rhs = lambdify_system(eq_strings, names)
        equations = [
            f"d{n}/dt = {eq}" for n, eq in zip(names, eq_strings)
        ]
    elif engine == "stlsq":
        model = fit_sindy(
            z_data, t, degree=degree, threshold=stlsq_threshold, alpha=stlsq_alpha
        )
        rhs = model
        equations = model.equations()
    else:
        raise ValueError(
            f"unknown SR engine {engine!r} (use 'stlsq', 'gp' or 'pysr')"
        )
    if log is not None:
        for eq in equations:
            log(eq)
    z_sim = simulate(rhs, z_data[0], t)

    if recon_fn is None:
        recon_fn = lambda p: desmo_model.apply(p, batch["pod_modes"], spec)[0]
    injected = inject_channels(params, channels, z_sim.astype(np.float32))
    x = jnp.asarray(batch["x"])
    recon0 = recon_fn(params)
    recon1 = recon_fn(injected)
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
        equations=equations,
        rhs=rhs,
    )


def forecast(
    params: dict,
    batch: dict,
    spec,
    x_future: np.ndarray,
    log: Optional[Callable[[str], None]] = None,
    stabilize: bool = False,
    recon_fn: Optional[Callable] = None,
    **identify_kwargs,
) -> dict:
    """Reduced-order FORECASTING via the identified dynamics (beyond
    reference: the reference only re-simulates the training window,
    ``DESMO-SR/...py:1228-1391``).

    Runs :func:`identify_and_reinject` on the training window, then
    integrates the fitted dz/dt from z(0) PAST the window and reconstructs
    the flow at the held-out times: only the identified channels carry
    signal there (the non-active channels' free z(t) have no value at unseen
    times — exactly why they were sparsified away), so the future temporal
    blocks are zero except the simulated channels.

    ``x_future`` (n, h): the held-out snapshots, preprocessed consistently
    with the TRAIN window (same magnitude/stride transforms, centered on the
    train window's temporal mean). Returns the record dict
    ``{m_train, horizon, error_train_simulated, error_forecast,
    per_snapshot_error, channels, equations, z_future}``.
    """
    import jax.numpy as jnp

    from desmo_tpu import losses as losses_mod
    from desmo_tpu.models import desmo as desmo_model

    res = identify_and_reinject(
        params, batch, spec, log=log, recon_fn=recon_fn, **identify_kwargs
    )
    if recon_fn is None:
        recon_fn = lambda p: desmo_model.apply(p, batch["pod_modes"], spec)[0]
    rhs = res.rhs
    stabilized = False
    if stabilize and res.model is not None and res.model.degree == 1:
        # long-horizon integration: clamp unstable eigenvalues of the linear
        # part (stabilize_linear) — identification reports keep the raw fit
        m2 = stabilize_linear(res.model)
        if m2 is not res.model:
            rhs = m2
            stabilized = True
            if log is not None:
                log(
                    "forecast: linear part had unstable eigenvalues — "
                    "projected onto the stable half-plane for integration"
                )
    m_train = res.z_data.shape[0]
    h = int(np.asarray(x_future).shape[1])
    t_full = np.arange(m_train + h, dtype=np.float64)
    z_full = simulate(rhs, res.z_data[0], t_full)
    z_future = z_full[m_train:]
    zeroed = dict(
        params,
        z=jnp.zeros((spec.num_poly_terms, h), jnp.float32),
        z_trig=jnp.zeros((3, spec.r, h), jnp.float32),
    )
    injected = inject_channels(zeroed, res.channels, z_future.astype(np.float32))
    recon_f = recon_fn(injected)
    err_f = float(
        losses_mod.relative_frobenius_error(jnp.asarray(x_future), recon_f)
    )
    per_f = np.asarray(
        losses_mod.per_snapshot_relative_error(jnp.asarray(x_future), recon_f)
    )
    # in-window per-snapshot error of the SAME model class the future window
    # is scored with (active channels carry the simulated dynamics, all other
    # channels zeroed — at unseen times their values are unknown, so keeping
    # their trained in-window values would make the two halves of the
    # error-vs-horizon curve incomparable and render a spurious jump at the
    # boundary). res.error_simulated stays the reference-parity aggregate
    # (simulated dynamics reinjected into the FULL trained model).
    zeroed_t = dict(
        params,
        z=jnp.zeros_like(params["z"]),
        z_trig=jnp.zeros_like(params["z_trig"]),
    )
    # the SAME trajectory the future window was integrated with (incl. any
    # stabilization) — both halves of the curve come from one model
    injected_t = inject_channels(
        zeroed_t, res.channels, z_full[:m_train].astype(np.float32)
    )
    recon_t = recon_fn(injected_t)
    per_t = np.asarray(
        losses_mod.per_snapshot_relative_error(jnp.asarray(batch["x"]), recon_t)
    )
    if log is not None:
        log(
            f"forecast: identified dynamics integrated {h} steps past the "
            f"{m_train}-snapshot training window; held-out rel err {err_f:.6f} "
            f"(in-window simulated err {res.error_simulated:.6f})"
        )
    return {
        "m_train": int(m_train),
        "horizon": h,
        "error_train_simulated": res.error_simulated,
        "error_forecast": err_f,
        # error at each forecast step — horizon-dependent growth of the
        # integrated dynamics (feeds viz.forecast_errors)
        "per_snapshot_error": per_f.tolist(),
        "per_snapshot_train_error": per_t.tolist(),
        "stabilized": stabilized,
        "channels": list(res.channels),
        "equations": res.equations,
        "z_future": z_future,
        "z_data": res.z_data,
        "z_sim": z_full[:m_train],
    }


# ---------------------------------------------------------------------------
# Optional PySR (genetic symbolic regression) — reference ...py:1120-1134
# ---------------------------------------------------------------------------


def fit_pysr(
    z: np.ndarray,
    dzdt: np.ndarray,
    variable_names: Optional[Sequence[str]] = None,
    **overrides,
):
    """Genetic symbolic regression of dz/dt (requires the optional ``pysr``
    package + Julia). Configured like the reference (``...py:1118-1134``):
    +,-,*,/ binary ops, sin unary, nesting/complexity constraints,
    squared-error loss, named channel variables. Feed the fitted model to
    :func:`equation_tables_from_pysr` + :func:`select_equations`."""
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
        denoise=False,
    )
    kwargs.update(overrides)
    model = PySRRegressor(**kwargs)  # pragma: no cover
    model.fit(  # pragma: no cover
        z, dzdt, variable_names=list(variable_names) if variable_names else None
    )
    return model  # pragma: no cover
