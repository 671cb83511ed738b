"""Built-in genetic-programming symbolic regression (`desmo_tpu.gp`) — the
DESMO-SR discovery leg without Julia/PySR.

Contract under test: the reference PySR configuration's operator set and
constraints (`DESMO-SR/...DynamicalSystemsFit.py:1118-1134` — +,-,*,/ and
sin, no nested sin, per-argument complexity caps), PySR-style hall-of-fame
score tables consumable by `sr.select_equations`, deterministic seeding, and
end-to-end recovery of known dynamics through `sr.identify_and_reinject`."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from desmo_tpu import gp, sr
from desmo_tpu.models import desmo


# --- primitives --------------------------------------------------------------


def test_complexity_is_node_count():
    assert gp.complexity(("var", 0)) == 1
    assert gp.complexity(("const", 2.0)) == 1
    assert gp.complexity(("sin", ("var", 0))) == 2
    tree = ("+", ("*", ("const", 2.0), ("var", 0)), ("sin", ("var", 1)))
    assert gp.complexity(tree) == 6


def test_constraints_reject_nested_sin_and_fat_args():
    ok = ("sin", ("+", ("var", 0), ("var", 1)))
    assert gp.check_constraints(ok, max_complexity=25)
    nested = ("sin", ("+", ("var", 0), ("sin", ("var", 1))))
    assert not gp.check_constraints(nested, max_complexity=25)
    # sin argument capped at complexity 5 (reference constraints sin: 5)
    fat = ("var", 0)
    for _ in range(3):
        fat = ("+", fat, ("var", 1))  # complexity 7
    assert not gp.check_constraints(("sin", fat), max_complexity=25)
    # '+' argument capped at 10
    fatter = fat
    for _ in range(2):
        fatter = ("+", fatter, ("var", 0))  # complexity 11
    assert not gp.check_constraints(("+", fatter, ("var", 1)), max_complexity=99)
    assert gp.check_constraints(("-", fatter, ("var", 1)), max_complexity=99)


def test_evaluate_matches_numpy():
    Z = np.random.default_rng(0).standard_normal((50, 2))
    tree = ("/", ("sin", ("*", ("const", 2.0), ("var", 0))), ("+", ("var", 1), ("const", 3.0)))
    got = gp.evaluate(tree, Z)
    want = np.sin(2.0 * Z[:, 0]) / (Z[:, 1] + 3.0)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_to_str_sympy_roundtrip():
    import sympy

    names = ["z2", "z6"]
    tree = ("-", ("*", ("const", 0.5), ("sin", ("var", 1))), ("var", 0))
    s = gp.to_str(tree, names)
    expr = sympy.sympify(s)
    f = sympy.lambdify(sympy.symbols(names), expr, modules="numpy")
    Z = np.random.default_rng(1).standard_normal((20, 2))
    np.testing.assert_allclose(f(Z[:, 0], Z[:, 1]), gp.evaluate(tree, Z), rtol=1e-12)


def test_fold_constants():
    assert gp.fold_constants(("*", ("const", 2.0), ("const", 3.0))) == ("const", 6.0)
    keep = ("*", ("const", 2.0), ("var", 0))
    assert gp.fold_constants(keep) == keep
    # division by zero stays unfolded rather than becoming inf
    bad = ("/", ("const", 1.0), ("const", 0.0))
    assert gp.fold_constants(bad) == bad


def _oscillator(m=400, w=1.0):
    t = np.linspace(0, 20, m)
    Z = np.stack([np.sin(w * t), np.cos(w * t)], axis=1)
    Y = np.stack([w * np.cos(w * t), -w * np.sin(w * t)], axis=1)
    return Z, Y


# --- fitting ------------------------------------------------------------------


def test_fit_gp_recovers_linear_oscillator():
    Z, Y = _oscillator()
    tables = gp.fit_gp(Z, Y, variable_names=["a", "b"], seed=0)
    assert len(tables) == 2
    for j, tab in enumerate(tables):
        best = max(tab, key=lambda c: c.score)
        # exact dynamics are in the search space: near-zero loss required
        assert best.loss < 1e-10 * np.var(Y[:, j]), (j, tab)
    eqs = sr.select_equations(tables)
    assert "b" in eqs[0] and "a" in eqs[1]


def test_fit_gp_is_deterministic():
    Z, Y = _oscillator(m=150)
    t1 = gp.fit_gp(Z, Y[:, :1], variable_names=["a", "b"], seed=3, niterations=8)
    t2 = gp.fit_gp(Z, Y[:, :1], variable_names=["a", "b"], seed=3, niterations=8)
    assert [(c.equation, c.loss) for c in t1[0]] == [
        (c.equation, c.loss) for c in t2[0]
    ]


def test_fit_gp_finds_sin_nonlinearity():
    """dz/dt = 1.5*sin(b) - 0.5*a: a target OUTSIDE any polynomial library
    (STLSQ degree-1 cannot express it) — the GP must drive the loss well
    below the best linear fit."""
    rng = np.random.default_rng(0)
    Z = rng.uniform(-2.5, 2.5, size=(500, 2))
    y = 1.5 * np.sin(Z[:, 1]) - 0.5 * Z[:, 0]
    # best linear least-squares baseline
    A = np.column_stack([np.ones(len(Z)), Z])
    resid = y - A @ np.linalg.lstsq(A, y, rcond=None)[0]
    linear_floor = float(np.mean(resid**2))
    tables = gp.fit_gp(Z, y[:, None], variable_names=["a", "b"], seed=1,
                       niterations=80)
    best = min(tables[0], key=lambda c: c.loss)
    assert best.loss < 0.05 * linear_floor, (best, linear_floor)
    assert "sin" in best.equation


def test_tables_rank_by_score_not_raw_loss():
    """The hall of fame is a Pareto front: losses strictly improve with
    complexity, and the score field reflects log-loss improvement per unit
    complexity (PySR's selection statistic, ...py:1196-1226)."""
    Z, Y = _oscillator()
    (tab,) = gp.fit_gp(Z, Y[:, 1][:, None], variable_names=["a", "b"], seed=0)
    comps = [c.complexity for c in tab]
    losses = [c.loss for c in tab]
    assert comps == sorted(comps)
    assert all(l2 < l1 for l1, l2 in zip(losses, losses[1:]))
    assert all(np.isfinite(c.score) for c in tab)


# --- pipeline ----------------------------------------------------------------


def test_identify_and_reinject_gp_engine():
    """engine='gp' end to end: channels -> finite-difference targets -> GP
    fit -> score selection -> lambdify -> RK45 -> injection. Same synthetic
    harmonic pair as the pysr-branch test, but the equations are actually
    DISCOVERED here rather than handed in."""
    n, m, r = 64, 400, 2
    w = 2 * np.pi / 100.0
    t = np.arange(m, dtype=np.float64)
    spec = desmo.DesmoSpec(n, m, r, 2, 1.0)
    params = desmo.init_params(spec)
    z = np.zeros((spec.num_poly_terms, m), np.float32)
    z[1] = np.cos(w * t)
    z[2] = np.sin(w * t)
    c = np.zeros(spec.num_poly_terms, np.float32)
    c[1] = c[2] = 1.0
    params = dict(
        params,
        z=jnp.asarray(z),
        c=jnp.asarray(c),
        c_trig=jnp.zeros((3, r), jnp.float32),
        z_trig=jnp.zeros((3, r, m), jnp.float32),
    )
    rng = np.random.default_rng(0)
    pod_modes = jnp.asarray(rng.standard_normal((n, r)) / np.sqrt(n), jnp.float32)
    recon, _, _ = desmo.apply(params, pod_modes, spec)
    batch = {"x": recon, "pod_modes": pod_modes}
    channels = [("poly", 1), ("poly", 2)]

    out = sr.identify_and_reinject(
        params, batch, spec, channels=channels, engine="gp", t=t,
        gp_kwargs={"seed": 0, "niterations": 40},
    )
    assert out.model is None
    assert out.equations[0].startswith("dz1/dt = ")
    # the discovered ODE must track the true trajectories when integrated
    # (finite-difference targets put an O(dt^2) floor under the fit)
    np.testing.assert_allclose(out.z_sim, out.z_data, atol=5e-2)
    assert out.error_simulated < out.error_original + 0.05


REFERENCE = "/root/reference"


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)
def test_gp_recovers_oscillator_structure_from_shipped_checkpoint():
    """Golden anchor: run the built-in GP engine on the SAME five temporal
    channels the reference extracts from its shipped r=2 cylinder checkpoint
    (z2, z6, z8, z9, z11 — ``DESMO-SR/cylinder_flow/DESMO-Cylinder-
    ReadAndInference-DynamicalSystemsFit.py:986-990``) and assert the
    score-selected Pareto front reproduces the linear-oscillator structure
    the reference's PySR run found (``...py:1191-1226``): each dz_i/dt is a
    single linear term in its conjugate partner, with the coefficient the
    data fixes (cross-checked against the STLSQ fit of the same targets).

    Data-free: the channels are checkpoint parameters; the t-grid is the
    reference's own np.linspace(0, m, m) convention."""
    from desmo_tpu import checkpoint

    import sympy

    rel = "DESMO-SR/cylinder_flow/DESMO_r2_final_2025-01-27_20-41-11.pt"
    sd = checkpoint.load_pt(os.path.join(REFERENCE, rel))
    params = checkpoint.params_from_state_dict(sd, "desmo")
    m = params["z"].shape[1]
    spec = desmo.DesmoSpec(
        n=params["phi"].shape[1], m=m, r=2, poly_order=2
    )
    Z = sr.extract_channels(params, sr.REFERENCE_CYLINDER_CHANNELS)
    t = np.linspace(0, m, m, dtype=np.float64)
    dZ = sr.finite_difference(Z, t)
    names = sr.channel_names(sr.REFERENCE_CYLINDER_CHANNELS, spec)
    assert names == ["z2", "z6", "z8", "z9", "z11"]

    # the STLSQ comparator: a clean conjugate-pair linear system — (z6, z9)
    # and (z8, z11) oscillators, z2 slaved to z8 (the sparsify-selected
    # harmonic); column order of coefficients is [1, z2, z6, z8, z9, z11]
    lin = sr.fit_sindy(Z, t, degree=1)
    partners = {0: "z8", 1: "z9", 2: "z2", 3: "z6", 4: "z8"}
    col = {nm: 1 + j for j, nm in enumerate(names)}

    tables = gp.fit_gp(
        Z, dZ, variable_names=names,
        niterations=30, population_size=200, seed=0,
    )
    eqs = sr.select_equations(tables)
    syms = sympy.symbols(names)
    for j, (tab, eq) in enumerate(zip(tables, eqs)):
        # score ordering: select_equations picked the argmax-score row, and
        # that row is the single linear term (complexity 3: c op var) — the
        # same shape PySR's score statistic selected for the reference
        best = max(tab, key=lambda c: c.score)
        assert eq == best.equation
        assert best.complexity == 3, (j, best)
        expr = sympy.sympify(eq)
        partner = sympy.Symbol(partners[j])
        assert expr.free_symbols == {partner}, (j, eq)
        poly = sympy.Poly(expr, *syms)
        assert poly.total_degree() == 1, (j, eq)
        coeff = float(expr.coeff(partner))
        ref_coeff = float(lin.coefficients[j, col[partners[j]]])
        if j == 2:
            # STLSQ splits this target over z2 AND z11; GP's single-term
            # pick keeps the dominant z2 with the right sign
            assert coeff > 0 and ref_coeff > 0
        else:
            assert coeff == pytest.approx(ref_coeff, rel=0.02), (j, eq)

    # the selected 5-equation system explains the finite-difference
    # derivatives: R^2 >= 0.97 per target (measured 0.988-0.9999)
    rhs = sr.lambdify_system(eqs, names)
    pred = np.stack([rhs(z) for z in Z])
    for j in range(Z.shape[1]):
        r2 = 1.0 - np.var(dZ[:, j] - pred[:, j]) / np.var(dZ[:, j])
        assert r2 >= 0.97, (j, r2)


def test_unknown_engine_message_names_gp():
    spec = desmo.DesmoSpec(16, 30, 2, 2, 1.0)
    params = desmo.init_params(spec)
    batch = {
        "x": jnp.zeros((16, 30)),
        "pod_modes": jnp.zeros((16, 2)),
    }
    with pytest.raises(ValueError, match="gp"):
        sr.identify_and_reinject(
            params, batch, spec, channels=[("poly", 0)], engine="nope"
        )
