"""Golden sparsification parity: the nonzero-term counts printed in the
reference's shipped training logs must be reproduced exactly from the shipped
checkpoints.

Term energies depend only on checkpoint parameters (raw phi masks, c, z,
omega, periods — no flow data), so the sweep tables' "Nonzero Terms" columns
are a data-free golden contract. The tables below are transcribed from the
``Summary of Results`` blocks of each ``DESMO.out``.
"""

import os

import numpy as np
import pytest

from desmo_tpu import checkpoint, sparsify
from desmo_tpu.models import desmo, fourier

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)

# (checkpoint, variant, r, poly_order, n_fourier, threshold grid (lo, hi), counts)
GOLDEN = [
    (
        "DESMO/cylinder_flow/DESMO_r4_final_2025-01-25_17-08-31.pt",
        "desmo", 4, 3, 0, (4.0, -3.0),
        # DESMO/cylinder_flow/DESMO.out:10096-10110
        [47, 47, 47, 47, 47, 41, 36, 21, 18, 14, 11, 7, 4, 4],
    ),
    (
        "DESMO/aneurysm/DESMO_r4_final_2025-01-27_19-06-26.pt",
        "desmo", 4, 2, 0, (4.0, -3.0),
        # DESMO/aneurysm/DESMO.out:10106-
        [20, 18, 11, 10, 9, 9, 9, 9, 9, 8, 8, 8, 8, 7],
    ),
    (
        "DESMO/turbulent_channel/DESMO_r4_final_2025-04-15_15-44-04.pt",
        "desmo", 4, 2, 0, (4.0, -3.0),
        # DESMO/turbulent_channel/DESMO.out:6069-
        [27, 27, 27, 27, 27, 25, 24, 22, 19, 13, 12, 11, 8, 4],
    ),
    (
        "DESMO_Fourier/cylinder_flow/DESMOCF_r2_final_2025-02-11_16-45-07.pt",
        "fourier", 2, 2, 10, (6.0, -5.0),
        # DESMO_Fourier/cylinder_flow/DESMO.out:9092- (m=1001 t-grid)
        [12, 12, 12, 12, 12, 12, 11, 11, 11, 11, 11, 10, 8, 7, 7, 4, 4, 2, 0, 0, 0, 0],
    ),
    (
        "DESMO_Fourier/aneurysm/DESMOFourier_r2_final_2025-02-05_03-17-57.pt",
        "fourier", 2, 2, 30, (5.0, -5.0),
        # DESMO_Fourier/aneurysm/DESMO.out:10111- (m=1000 t-grid)
        [12, 12, 12, 12, 12, 11, 9, 9, 9, 9, 9, 9, 8, 6, 6, 5, 2, 1, 0, 0],
    ),
]

FOURIER_M = {"cylinder_flow": 1001, "aneurysm": 1000}


def _spec_and_params(rel, variant, r, P, nF):
    sd = checkpoint.load_pt(os.path.join(REFERENCE, rel))
    params = checkpoint.params_from_state_dict(sd, variant)
    n = params["phi"].shape[1]
    if variant == "fourier":
        m = FOURIER_M[rel.split("/")[1]]
        spec = fourier.FourierSpec(n=n, m=m, r=r, poly_order=P, n_fourier=nF)
    else:
        m = params["z"].shape[1]
        spec = desmo.DesmoSpec(n=n, m=m, r=r, poly_order=P)
    return spec, params


@pytest.mark.parametrize(
    "rel,variant,r,P,nF,grid,golden", GOLDEN,
    ids=[g[0].split("/")[-2] + "-" + g[1] for g in GOLDEN],
)
def test_energy_values_match_shipped_logs(rel, variant, r, P, nF, grid, golden):
    """The raw poly/nonlinear energy arrays are printed in every log
    ('Poly norms: [...]' / 'Nonlinear terms norms: [...]', CYL:1204-1205) —
    compare value-for-value (fp32 accuracy)."""
    import re

    log_path = os.path.join(REFERENCE, os.path.dirname(rel), "DESMO.out")
    if not os.path.exists(log_path):
        pytest.skip("log not shipped")
    log = open(log_path, errors="replace").read()
    m_poly = re.search(r"Poly norms:\s*\[([^\]]*)\]", log)
    m_nl = re.search(r"Nonlinear terms norms:\s*\[([^\]]*)\]", log)
    if m_poly is None or m_nl is None:
        pytest.skip("log prints no energy arrays")
    poly_ref = np.array([float(v) for v in m_poly.group(1).split()])
    nl_ref = np.array([float(v) for v in m_nl.group(1).split()])

    spec, params = _spec_and_params(rel, variant, r, P, nF)
    e = sparsify.term_energies(params, spec=spec)
    assert np.max(np.abs(e.poly - poly_ref) / (np.abs(poly_ref) + 1e-12)) < 1e-4
    nl_ours = e.interleaved_trig()
    assert np.max(np.abs(nl_ours - nl_ref) / (np.abs(nl_ref) + 1e-12)) < 1e-4


@pytest.mark.parametrize("rel,variant,r,P,nF,grid,golden", GOLDEN, ids=[g[0].split("/")[-2] + "-" + g[1] for g in GOLDEN])
def test_sweep_counts_match_shipped_logs(rel, variant, r, P, nF, grid, golden):
    spec, params = _spec_and_params(rel, variant, r, P, nF)

    energies = sparsify.term_energies(params, spec=spec)
    thresholds = sparsify.default_thresholds(*grid)
    assert len(thresholds) == len(golden), "threshold grid mismatch"
    counts = [
        sparsify.nonzero_terms(sparsify.zero_below_threshold(params, energies, float(t)))
        for t in thresholds
    ]
    assert counts == golden, f"{rel}: {counts} != {golden}"


def test_channel_greedy_removal_order_matches_shipped_log():
    """Golden greedy-prune parity (turbulent channel): the removal ORDER our
    ``sparsify.greedy_order`` derives from the shipped channel checkpoint must
    equal the order the reference's greedy loop walks
    (``DESMO/turbulent_channel/DESMO-TurbulentChannel.py:1173-1190``, table at
    ``DESMO/turbulent_channel/DESMO.out:6115-``).

    The flow data itself is not shipped, so the per-step ERROR column cannot be
    recomputed — but the order is data-free, and the log prints the energy
    arrays the reference sorted ('Poly norms:' / 'Nonlinear terms norms:',
    DESMO.out:6048-6051). We rebuild the reference order from those printed
    values with the reference's exact bookkeeping (poly-first insertion, per-
    latent sin/cos/tanh interleave, stable ascending sort) and assert our
    checkpoint-derived order matches term-for-term. The data-free nonzero-terms
    column (27 - step) is pinned against the log table as well."""
    import re

    rel = "DESMO/turbulent_channel/DESMO_r4_final_2025-04-15_15-44-04.pt"
    spec, params = _spec_and_params(rel, "desmo", 4, 2, 0)
    log = open(
        os.path.join(REFERENCE, "DESMO/turbulent_channel/DESMO.out"), errors="replace"
    ).read()
    poly_ref = np.array(
        [float(v) for v in re.search(r"Poly norms:\s*\[([^\]]*)\]", log).group(1).split()]
    )
    nl_ref = np.array(
        [
            float(v)
            for v in re.search(r"Nonlinear terms norms:\s*\[([^\]]*)\]", log).group(1).split()
        ]
    )
    # Reference order: term_norms built poly-first then interleaved trig,
    # stable-sorted ascending by norm (...TurbulentChannel.py:1173-1190).
    kinds = ("sin", "cos", "tanh")
    ref_terms = [(poly_ref[t], ("poly", t)) for t in range(len(poly_ref))]
    for i in range(len(nl_ref) // 3):
        for k in range(3):
            ref_terms.append((nl_ref[i * 3 + k], (kinds[k], i)))
    ref_terms.sort(key=lambda x: x[0])
    ref_order = [t for _, t in ref_terms]

    energies = sparsify.term_energies(params, spec=spec)
    ours = [
        ("poly", idx) if kind == "poly" else (kinds[idx[0]], idx[1])
        for _, kind, idx in sparsify.greedy_order(energies)
    ]
    assert ours == ref_order

    # Data-free column of the shipped table (DESMO.out:6115-): one term
    # removed per step, 27 -> 0, fingerprinting that no term is double-counted.
    rows = re.findall(r"^(\d+)\s+[\d.]+\s+(\d+)\s*$", log[log.rfind("Summary of Results") :], re.M)
    assert [int(nz) for _, nz in rows] == list(range(27, -1, -1))
    assert len(ours) == 27


def test_sr_cylinder_channel_selection_from_shipped_checkpoint():
    """Golden SR channel selection: the five temporal channels the reference
    extracts for its dynamical-systems fit — z2, zsin0, ztanh0, zsin1, ztanh1
    (``DESMO-SR/cylinder_flow/DESMO-Cylinder-ReadAndInference-
    DynamicalSystemsFit.py:986-990``) — must be derivable from the shipped
    r=2 checkpoint by the script's own sparsification, not hard-coded.

    Two anchors: (a) the script's raw-coefficient threshold sweep
    (``...py:1460-1538``, grid 10^-i for i in arange(8, 2, -0.5)) leaves
    exactly those five coefficients nonzero at grid points 1e-3 and
    10^-2.5; (b) ``sr.active_channels`` over term energies reproduces the
    same set across the whole (13.3, 135] energy window."""
    from desmo_tpu import sr

    rel = "DESMO-SR/cylinder_flow/DESMO_r2_final_2025-01-27_20-41-11.pt"
    spec, params = _spec_and_params(rel, "desmo", 2, 2, 0)
    target = set(sr.REFERENCE_CYLINDER_CHANNELS)
    assert target == {("poly", 2), ("sin", 0), ("tanh", 0), ("sin", 1), ("tanh", 1)}

    # (a) raw-coefficient thresholding at the script's own sweep grid points
    kinds = ("sin", "cos", "tanh")
    for threshold in (1e-3, 10 ** -2.5):
        pruned = sparsify.zero_coefficients_below(params, threshold)
        survivors = {("poly", t) for t in np.flatnonzero(np.asarray(pruned["c"]))}
        for k, i in zip(*np.nonzero(np.asarray(pruned["c_trig"]))):
            survivors.add((kinds[k], int(i)))
        assert survivors == target, f"threshold {threshold}: {survivors}"

    # (b) energy-based selection over the full window between the 6th- and
    # 5th-largest term energies (poly1 = 13.23, sin0 = 135.5)
    energies = sparsify.term_energies(params, spec=spec)
    for threshold in (14.0, 50.0, 100.0, 135.0):
        assert set(sr.active_channels(energies, threshold)) == target
