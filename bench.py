"""Benchmark: DESMO cylinder_flow optimizer-step throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the reference PyTorch run's ~28 steps/s on 1 GPU for the identical
problem (n=3961, m=1001, r=4, P=3, full batch; BASELINE.md "cylinder_flow:
optimizer steps/sec", derived from checkpoint timestamps in
DESMO/cylinder_flow/DESMO.out).
"""

import json
import time

import numpy as np

BASELINE_STEPS_PER_SEC = 28.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo

    cfg = configs.get("cylinder")
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)

    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    p = pod.pod(x, cfg.r)
    params = desmo.init_params(spec)
    loss_fn = desmo.build_loss(
        spec, cfg.beta, cfg.l1_lambda,
        method="fused" if jax.default_backend() == "tpu" else "factored",
    )
    xd = jnp.asarray(x)
    batch = {"x": xd, "pod_modes": p.modes, "x_sq": jnp.sum(xd * xd)}
    if jax.default_backend() == "tpu":
        from desmo_tpu.pallas import split_snapshots

        batch["x_hi"], batch["x_lo"] = split_snapshots(xd)

    train_chunk = train.make_train_chunk(loss_fn, desmo.param_groups(params), cfg)
    state = train.init_state(params, cfg)
    state = jax.tree.map(jnp.array, state)

    # Warmup with the SAME static chunk size (compile), then time several
    # chunks on the evolving state. NOTE: on the tunneled TPU runtime,
    # block_until_ready does not synchronize and identical calls are memoized;
    # fetching a result value is the only reliable fence, and the evolving
    # state guarantees fresh execution.
    steps = 2000
    state, metrics = train_chunk(state, batch, num_steps=steps)
    _ = float(np.asarray(metrics["rec"])[-1])

    times = []
    rec = float("nan")
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = train_chunk(state, batch, num_steps=steps)
        rec = float(np.asarray(metrics["rec"])[-1])
        times.append(time.perf_counter() - t0)

    sps = steps / sorted(times)[len(times) // 2]
    assert np.isfinite(rec), "training diverged during benchmark"
    print(
        json.dumps(
            {
                "metric": "cylinder_flow full-batch optimizer steps/sec (n=3961, m=1001, r=4, P=3)",
                "value": round(sps, 2),
                "unit": "steps/s",
                "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
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
