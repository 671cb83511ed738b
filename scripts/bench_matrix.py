"""Throughput matrix across all reference configurations, on the real device.

Prints one row per preset with steps/s and the ratio to the reference's
measured GPU throughput (BASELINE.md). Usage:

    python scripts/bench_matrix.py [--steps 1000]
"""

import argparse
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REFERENCE_STEPS_PER_SEC = {
    "cylinder": 28.0,
    "aneurysm": 3.5,
    "channel": 5.2,
    "fourier_cylinder": 18.0,
    "fourier_aneurysm": 3.2,
    "ae_cylinder": float("nan"),  # AE run's log is not shipped
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--presets", nargs="*", default=list(REFERENCE_STEPS_PER_SEC))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, runner, train
    from desmo_tpu.io import synthetic

    rows = []
    for name in args.presets:
        cfg = configs.get(name)
        x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
        spec, params, loss_fn, groups = runner.build_model(cfg)

        # same chunk selection AND batch prep as runner.run / bench.py
        from desmo_tpu.pallas import train_chunk as tc

        chunk = tc.select_chunk(spec, cfg)
        batch = runner.prepare_chunk_batch(
            cfg, x,
            pod_modes=None if cfg.variant == "ae" else pod.pod(x, cfg.r).modes,
            chunk=chunk,
        )
        if chunk is None:
            chunk = train.make_train_chunk(loss_fn, groups, cfg)
        state = jax.tree.map(jnp.array, train.init_state(params, cfg))
        state, met = chunk(state, batch, num_steps=args.steps)
        _ = float(np.asarray(met["rec"])[-1])  # fence (see bench.py notes)
        times = []
        for _i in range(3):
            t0 = time.perf_counter()
            state, met = chunk(state, batch, num_steps=args.steps)
            _ = float(np.asarray(met["rec"])[-1])
            times.append(time.perf_counter() - t0)
        sps = args.steps / sorted(times)[len(times) // 2]
        ref = REFERENCE_STEPS_PER_SEC.get(name, float("nan"))
        rows.append(
            {
                "preset": name,
                "steps_per_sec": round(sps, 1),
                "reference_steps_per_sec": ref,
                "speedup": round(sps / ref, 1) if ref == ref else None,
            }
        )
        print(json.dumps(rows[-1]), flush=True)

    print("\npreset             steps/s      ref     speedup")
    for r in rows:
        spd = f"{r['speedup']:.0f}x" if r["speedup"] else "  - "
        print(f"{r['preset']:18s} {r['steps_per_sec']:9.1f} {r['reference_steps_per_sec']:8.1f} {spd:>9s}")


if __name__ == "__main__":
    main()
