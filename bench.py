"""Benchmark: DESMO optimizer-step throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Primary metric = the cylinder_flow preset (n=3961, m=1001, r=4, P=3, full
batch) against the reference PyTorch run's ~28 steps/s on 1 GPU (BASELINE.md
"cylinder_flow: optimizer steps/sec", derived from checkpoint timestamps in
DESMO/cylinder_flow/DESMO.out). Extras: dispersion of the median (the chip is
time-shared; see CLAUDE.md) and an aneurysm-scale entry (n=27000, m=1000,
r=4, P=2; baseline ~3.5 steps/s from DESMO/aneurysm/DESMO.out stamps).
"""

import json
import time

import numpy as np

BASELINE_CYLINDER = 28.0
BASELINE_ANEURYSM = 3.5


def bench_preset(preset: str, steps: int, reps: int):
    """Median + IQR steps/s over `reps` timed chunks of `steps` epochs.

    NOTE: on the tunneled TPU runtime, block_until_ready does not synchronize
    and identical calls are memoized; fetching a result value is the only
    reliable fence, and the evolving state guarantees fresh execution.
    """
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo

    cfg = configs.get(preset)
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    p = pod.pod(x, cfg.r)
    params = desmo.init_params(spec)
    on_tpu = jax.default_backend() == "tpu"
    loss_fn = desmo.build_loss(
        spec, cfg.beta, cfg.l1_lambda, method="fused" if on_tpu else "factored"
    )
    xd = jnp.asarray(x)
    batch = {"x": xd, "pod_modes": p.modes, "x_sq": jnp.sum(xd * xd)}
    if on_tpu:
        from desmo_tpu.pallas import split_snapshots

        batch["x_hi"], batch["x_lo"] = split_snapshots(xd)

    from desmo_tpu.pallas import train_chunk as tc

    # resident/streamed mega-kernel where supported, scanned chunk otherwise
    train_chunk = tc.select_chunk(spec, cfg)
    if train_chunk is None:
        train_chunk = train.make_train_chunk(
            loss_fn, desmo.param_groups(params), cfg, unroll=cfg.scan_unroll
        )
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))

    # warmup with the SAME static chunk size (compile)
    state, metrics = train_chunk(state, batch, num_steps=steps)
    rec = float(np.asarray(metrics["rec"])[-1])

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = train_chunk(state, batch, num_steps=steps)
        rec = float(np.asarray(metrics["rec"])[-1])
        times.append(time.perf_counter() - t0)
    assert np.isfinite(rec), f"{preset}: training diverged during benchmark"
    sps = sorted(steps / np.asarray(times))
    q1, med, q3 = np.percentile(sps, [25, 50, 75])
    return {"median": round(float(med), 2), "iqr": [round(float(q1), 2), round(float(q3), 2)], "n": reps}


def main() -> None:
    cyl = bench_preset("cylinder", steps=2000, reps=7)
    anr = bench_preset("aneurysm", steps=500, reps=5)
    print(
        json.dumps(
            {
                "metric": "cylinder_flow full-batch optimizer steps/sec (n=3961, m=1001, r=4, P=3)",
                "value": cyl["median"],
                "unit": "steps/s",
                "vs_baseline": round(cyl["median"] / BASELINE_CYLINDER, 2),
                "spread": cyl,
                "aneurysm": {
                    "metric": "aneurysm full-batch optimizer steps/sec (n=27000, m=1000, r=4, P=2)",
                    "value": anr["median"],
                    "unit": "steps/s",
                    "vs_baseline": round(anr["median"] / BASELINE_ANEURYSM, 2),
                    "spread": anr,
                },
            }
        )
    )


if __name__ == "__main__":
    # the tunneled TPU runtime occasionally throws transient
    # FailedPrecondition errors; retry before giving up
    for attempt in range(3):
        try:
            main()
            break
        except Exception:
            if attempt == 2:
                raise
            time.sleep(10)
