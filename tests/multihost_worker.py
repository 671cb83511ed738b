"""One process of a multi-host (multi-process) DESMO training run.

Launched by ``tests/test_multihost.py`` (and usable as a manual 2-process
DCN rehearsal): each process owns 4 virtual CPU devices, joins a 2-process
cluster via ``parallel.distributed_init`` (SURVEY §5.8 — the reference is
strictly single-process, `GPU_jobfile.sh:13`), and runs the SAME sharded
training chunk over the GLOBAL 8-device ('space',) mesh that
``tests/test_parallel.py`` runs single-process. Every process feeds the full
(identical) batch; ``jax.device_put`` against the global NamedSharding keeps
only the addressable shards locally, and the compiled chunk's reductions run
as cross-process collectives.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""

import json
import sys


def build_problem():
    """Deterministic tiny desmo problem — keep in lockstep with the
    single-process comparator in ``tests/test_multihost.py``."""
    import jax.numpy as jnp

    from desmo_tpu import configs, pod
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo

    n, m, r = 128, 64, 2
    cfg = configs.RunConfig(
        name="mh", variant="desmo", n=n, m=m, r=r, poly_order=2,
        omega_init=1.0, lr_omega=1.0, num_epochs=60, patience=20,
        sched_every=1, log_every=100, checkpoint_every=1000,
    )
    x = synthetic.separable_rank_k(n, m, k=r, seed=0)
    x -= x.mean(axis=1, keepdims=True)
    p = pod.pod(x, r)
    spec = desmo.DesmoSpec(n, m, r, 2, 1.0)
    params = desmo.init_params(spec)
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda)
    batch = {"x": jnp.asarray(x), "pod_modes": p.modes}
    return cfg, spec, params, loss_fn, batch


def run_sharded_chunk(steps: int = 60) -> dict:
    """Train over the global ('space',) mesh; return process-local evidence:
    the replicated metrics trace, replicated small params, and in-jit global
    checksums of the sharded leaves (no host-side gather needed)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from desmo_tpu import train
    from desmo_tpu.models import desmo
    from desmo_tpu.parallel import (
        make_mesh, param_shardings, shard_batch, shard_state,
    )

    cfg, spec, params, loss_fn, batch = build_problem()
    mesh = make_mesh(n_space=len(jax.devices()), n_time=1)
    p_sh = param_shardings(params, mesh, cfg.m)
    chunk = train.make_train_chunk(
        loss_fn, desmo.param_groups(params), cfg, param_shardings=p_sh
    )
    state = shard_state(
        jax.tree.map(jnp.array, train.init_state(params, cfg)), mesh, cfg.m
    )
    state, metrics = chunk(state, shard_batch(batch, mesh), num_steps=steps)
    # global checksums of sharded leaves, computed in-jit (replicated out)
    sums = jax.jit(
        lambda p: {k: jnp.sum(jnp.abs(v)) for k, v in p.items()}
    )(state.params)
    return {
        "n_local_devices": len(jax.local_devices()),
        "n_global_devices": len(jax.devices()),
        "total": np.asarray(metrics["total"]).tolist(),
        "rec": np.asarray(metrics["rec"]).tolist(),
        "param_abs_sums": {k: float(v) for k, v in sums.items()},
        "c": np.asarray(state.params["c"]).tolist(),
    }


def main(argv) -> int:
    pid, nproc, port, out = int(argv[0]), int(argv[1]), int(argv[2]), argv[3]
    import jax

    # axon gotcha (CLAUDE.md): configure via jax.config, not env vars
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    from desmo_tpu.parallel import distributed_init

    distributed_init(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    result = run_sharded_chunk()
    result["process_id"] = jax.process_index()
    with open(out, "w") as fh:
        json.dump(result, fh)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
