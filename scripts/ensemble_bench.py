"""TPU measurement: lane-packed multi-seed training vs single-seed.

Claim under test (ensemble.py): packing S seeds' K-term lane axes into the
MXU's 128-lane pad trains S models for roughly the cost of one *on the
scanned path*. Measures, per preset:

  - single-seed scanned chunk (same loss method the ensemble uses)
  - packed S = max_seeds_packed chunk
  - (context) the preset's round-3/4 mega-kernel number from docs

Same-window differencing only (the chip is time-shared; CLAUDE.md):
single vs packed are timed back-to-back in one process, interleaved reps.

Usage: python scripts/ensemble_bench.py [preset ...]  (default: aneurysm cylinder)
"""

import os
import re
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(preset: str, steps: int = 300, reps: int = 5, kernel: bool = True):
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, ensemble, pod, runner, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import train_chunk as tc

    cfg = configs.get(preset)
    # mirror runner.run's method choice for the scan comparison
    method = runner.resolve_loss_method(cfg)
    if method not in ("factored", "fused"):
        method = "fused"
    spec, params, loss_fn, groups = runner.build_model(cfg)
    S = ensemble.max_seeds_packed(spec)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    modes = pod.pod(x, cfg.r).modes
    batch = runner.prepare_chunk_batch(cfg, x, pod_modes=modes, chunk=None)
    kbatch = tc.prepare_batch(x, modes)

    timed = {}

    def add(name, chunk, state0):
        st = jax.tree.map(jnp.array, state0)
        st, mets = chunk(st, batch if "scan" in name else kbatch, num_steps=steps)
        tot = float(np.asarray(mets["total"])[-1])
        assert np.isfinite(tot), name
        timed[name] = [st, chunk, []]

    # --- single-seed scanned chunk (what S sequential restarts would cost)
    add("scan x1", train.make_train_chunk(loss_fn, groups, cfg, unroll=1),
        train.init_state(params, cfg))
    # --- packed ensemble scan chunk
    eparams = ensemble.init_params(spec, S, seed=0, phi_sigma=0.02)
    add(
        f"scan S={S}",
        ensemble.make_ensemble_chunk(
            ensemble.build_loss(spec, cfg, S, method=method), groups, cfg, S
        ),
        ensemble.init_state(eparams, cfg, S),
    )
    if kernel and tc.supports(spec, cfg):
        # --- single-seed mega-kernel (the preset's production path)
        add("mk   x1", tc.make_fused_train_chunk(spec, cfg),
            train.init_state(params, cfg))
    # --- SEED-PACKED mega-kernel, at ITS OWN capacity: the kernel caps at 8
    # seeds (svec scheduler rows) even when more fit lane-wise
    Sk = next((s for s in range(S, 0, -1) if tc.supports_packed(spec, cfg, s)), 0)
    if kernel and Sk > 1:
        kparams = (
            eparams if Sk == S
            else ensemble.init_params(spec, Sk, seed=0, phi_sigma=0.02)
        )
        add(f"mk   S={Sk}", tc.make_fused_ensemble_chunk(spec, cfg, Sk),
            ensemble.init_state(kparams, cfg, Sk))

    for _ in range(reps):  # interleave so window drift hits all equally
        for name, rec in timed.items():
            st, chunk, ts = rec
            t0 = time.perf_counter()
            st, mets = chunk(st, batch if "scan" in name else kbatch, num_steps=steps)
            tot = float(np.asarray(mets["total"])[-1])
            ts.append(time.perf_counter() - t0)
            rec[0] = st
            assert np.isfinite(tot), f"{name}: diverged during timed reps"

    K = spec.num_poly_terms + 3 * spec.r
    print(f"{preset}: K={K} S={S} method={method}", flush=True)
    out = {"preset": preset, "S": S, "K": K}
    base = {}
    for name, (st, chunk, ts) in timed.items():
        sps = float(np.median(steps / np.asarray(ts)))
        m_ = re.search(r"S=(\d+)", name)
        n_seeds = int(m_.group(1)) if m_ else 1
        base[name] = sps
        extra = ""
        if n_seeds > 1:
            ref = base.get("scan x1") if name.startswith("scan") else base.get("mk   x1")
            if ref:
                extra = (
                    f"  cost {ref / sps:5.2f}x single -> "
                    f"{n_seeds * sps / ref:5.2f}x seed throughput vs sequential"
                )
        print(
            f"  {name:9s} {sps:10.1f} steps/s ({1e6 / sps:8.1f} us/step)"
            f" = {n_seeds * sps:10.1f} seed-steps/s{extra}",
            flush=True,
        )
        out[name] = sps
    return out


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("presets", nargs="*", default=["aneurysm", "cylinder"])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--no-kernel", action="store_true",
                    help="skip the mega-kernel paths (scan comparison only)")
    a = ap.parse_args()
    for p in a.presets or ["aneurysm", "cylinder"]:
        bench(p, steps=a.steps, reps=a.reps, kernel=not a.no_kernel)
