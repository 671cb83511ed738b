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
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda)
    batch = {"x": jnp.asarray(x), "pod_modes": p.modes}
    batch = jax.tree.map(jnp.asarray, batch)

    train_chunk = train.make_train_chunk(loss_fn, desmo.param_groups(params), cfg)
    state = train.init_state(params, cfg)
    state = jax.tree.map(jnp.array, state)

    # warmup + compile
    state, metrics = train_chunk(state, batch, num_steps=200)
    jax.block_until_ready(metrics)

    steps = 4000
    t0 = time.perf_counter()
    state, metrics = train_chunk(state, batch, num_steps=steps)
    jax.block_until_ready(metrics)
    dt = time.perf_counter() - t0

    sps = steps / dt
    rec = float(np.asarray(metrics["rec"])[-1])
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
    main()
