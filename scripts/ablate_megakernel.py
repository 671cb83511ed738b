"""Same-window ablation attribution of the mega-kernel step (any preset).

Each variant stubs one cost center via train_chunk._ABLATE (timing on TPU is
data-independent, so numerics-breaking stubs still measure real cost); the
delta vs baseline attributes that center's share of the step budget.

    python scripts/ablate_megakernel.py [preset] [steps]
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
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    p = pod.pod(x, cfg.r)
    params = desmo.init_params(spec)
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    batch = tc.prepare_batch(x, p.modes, bt=512, bm=128)

    def timed(reps=3):
        fused = tc.make_fused_train_chunk(spec, cfg, bt=512)
        state = jax.tree.map(jnp.array, train.init_state(params, cfg))
        state, mets = fused(state, batch, num_steps=steps)
        _ = float(np.asarray(mets["rec"])[-1])
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            state, mets = fused(state, batch, num_steps=steps)
            _ = float(np.asarray(mets["rec"])[-1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / steps * 1e6  # us/step

    variants = [
        {},  # baseline first and last (drift check)
        {"notrig": True},
        {"noxb": True},
        {"noaxga": True},
        {"noacc": True},
        {"nogather": True},
        {"noderiv": True},
        {"nodlo": True},
        {"ga1pass": True},
        {"noconcat": True},
        {},
    ]
    base = None
    for v in variants:
        tc._ABLATE.clear()
        tc._ABLATE.update(v)
        tc._build_call.cache_clear()
        us = timed()
        name = "+".join(sorted(v)) or "baseline"
        if base is None:
            base = us
        print(f"{name:28s} {us:8.1f} us/step   delta {base - us:+7.1f}", flush=True)
    tc._ABLATE.clear()
    tc._build_call.cache_clear()


if __name__ == "__main__":
    main()
