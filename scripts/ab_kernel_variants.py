"""Interleaved A/B timing of mega-kernel code variants (drift-proof).

The chip is time-shared and throughput drifts within a window; back-to-back
single measurements (ablate_megakernel.py) can alias that drift onto a
variant. This script round-robins the variants several times and reports
per-variant medians measured in the SAME window.

    python scripts/ab_kernel_variants.py [preset] [steps] [rounds] [v1,v2,..]

Variant names are train_chunk._ABLATE keys; 'baseline' = {}.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import train_chunk as tc

    cfg = configs.get(sys.argv[1] if len(sys.argv) > 1 else "cylinder")
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    names = (
        sys.argv[4].split(",")
        if len(sys.argv) > 4
        else ["baseline", "noconcat", "ga1pass"]
    )
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    p = pod.pod(x, cfg.r)
    params = desmo.init_params(spec)
    batch = tc.prepare_batch(x, p.modes, bt=512, bm=128)

    # build all variants up front (compile outside the timing loop); each
    # keeps its own state so timing only re-runs the chunk
    chunks = {}
    for name in names:
        tc._ABLATE.clear()
        if name != "baseline":
            tc._ABLATE[name] = True
        tc._build_call.cache_clear()
        fused = tc.make_fused_train_chunk(spec, cfg, bt=512)
        state = jax.tree.map(jnp.array, train.init_state(params, cfg))
        state, mets = fused(state, batch, num_steps=steps)  # compile+warm
        _ = float(np.asarray(mets["rec"])[-1])
        chunks[name] = (fused, state)
        # NOTE: _ABLATE is read at TRACE time; once compiled the executable
        # is frozen, so clearing below does not change timed variants
    tc._ABLATE.clear()
    tc._build_call.cache_clear()

    times = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            fused, state = chunks[name]
            t0 = time.perf_counter()
            state, mets = fused(state, batch, num_steps=steps)
            _ = float(np.asarray(mets["rec"])[-1])
            times[name].append(time.perf_counter() - t0)
            chunks[name] = (fused, state)
    base_med = np.median(times[names[0]]) / steps * 1e6
    for name in names:
        us = np.asarray(sorted(times[name])) / steps * 1e6
        med = float(np.median(us))
        print(
            f"{name:12s} med {med:7.2f} us/step  "
            f"[{us[0]:7.2f}, {us[-1]:7.2f}]  vs base {base_med - med:+6.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
