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
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench(preset: str, steps: int = 300, reps: int = 5):
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, ensemble, pod, runner, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo

    cfg = configs.get(preset)
    # ensemble scope = scanned path; mirror runner.run's method choice
    method = runner.resolve_loss_method(cfg)
    if method not in ("factored", "fused"):
        method = "fused"
    spec, params, loss_fn, groups = runner.build_model(cfg)
    S = ensemble.max_seeds_packed(spec)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    modes = pod.pod(x, cfg.r).modes
    batch = runner.prepare_chunk_batch(cfg, x, pod_modes=modes, chunk=None)

    # --- single-seed scanned chunk (what S sequential restarts would cost)
    single_chunk = train.make_train_chunk(loss_fn, groups, cfg, unroll=1)
    sstate = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sstate, mets = single_chunk(sstate, batch, num_steps=steps)  # compile
    float(np.asarray(mets["total"])[-1])

    # --- packed ensemble chunk
    eloss = ensemble.build_loss(spec, cfg, S, method=method)
    eparams = ensemble.init_params(spec, S, seed=0, phi_sigma=0.02)
    echunk = ensemble.make_ensemble_chunk(eloss, groups, cfg, S)
    estate = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    estate, emets = echunk(estate, batch, num_steps=steps)  # compile
    float(np.asarray(emets["total"])[-1])

    t_single, t_packed = [], []
    for _ in range(reps):  # interleave so window drift hits both equally
        t0 = time.perf_counter()
        sstate, mets = single_chunk(sstate, batch, num_steps=steps)
        tot = float(np.asarray(mets["total"])[-1])
        t_single.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        estate, emets = echunk(estate, batch, num_steps=steps)
        etot = float(np.asarray(emets["total"])[-1])
        t_packed.append(time.perf_counter() - t0)
    assert np.isfinite(tot) and np.isfinite(etot)

    sps_single = float(np.median(steps / np.asarray(t_single)))
    sps_packed = float(np.median(steps / np.asarray(t_packed)))
    K = spec.num_poly_terms + 3 * spec.r
    print(
        f"{preset}: K={K} S={S} method={method}\n"
        f"  single scanned   {sps_single:10.1f} steps/s "
        f"({1e6 / sps_single:8.1f} us/step)\n"
        f"  packed S={S}       {sps_packed:10.1f} steps/s "
        f"({1e6 / sps_packed:8.1f} us/step) = "
        f"{S * sps_packed:10.1f} seed-steps/s\n"
        f"  packed step cost  {sps_single / sps_packed:6.3f}x single "
        f"-> {S * sps_packed / sps_single:6.3f}x seed throughput vs "
        f"sequential restarts (same path)",
        flush=True,
    )
    return {
        "preset": preset, "S": S, "K": K, "method": method,
        "single_sps": sps_single, "packed_sps": sps_packed,
        "packed_cost_x": sps_single / sps_packed,
        "seed_throughput_x": S * sps_packed / sps_single,
    }


if __name__ == "__main__":
    presets = sys.argv[1:] or ["aneurysm", "cylinder"]
    for p in presets:
        bench(p)
