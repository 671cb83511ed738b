"""Mega-kernel vs scanned fused chunk on the real TPU (same window)."""

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
    from desmo_tpu.pallas import split_snapshots, train_chunk

    cfg = configs.get("cylinder")
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    p = pod.pod(x, cfg.r)
    params = desmo.init_params(spec)
    steps = 2000

    # numerics first: 50 steps mega-kernel vs factored scan
    batch_mk = train_chunk.prepare_batch(x, p.modes, bt=512, bm=128)
    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=512)
    s0 = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sk, mk = fused(s0, batch_mk, num_steps=50)
    loss_fn = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    ref_chunk = train.make_train_chunk(loss_fn, desmo.param_groups(params), cfg)
    sr = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sr, mr = ref_chunk(sr, batch_mk, num_steps=50)
    tot_k = np.asarray(mk["total"])
    tot_r = np.asarray(mr["total"])
    rel = np.max(np.abs(tot_k - tot_r) / np.abs(tot_r))
    print(f"metrics trace max rel dev vs factored scan (50 steps): {rel:.2e}", flush=True)

    def timed(run, state, batch, reps=5):
        state, mets = run(state, batch, num_steps=steps)
        _ = float(np.asarray(mets["rec"])[-1])
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            state, mets = run(state, batch, num_steps=steps)
            last = float(np.asarray(mets["rec"])[-1])
            ts.append(time.perf_counter() - t0)
        assert np.isfinite(last), "diverged"
        return steps / sorted(ts)[len(ts) // 2]

    s0 = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sps_mk = timed(fused, s0, batch_mk)
    print(f"mega-kernel      {sps_mk:10.0f} steps/s", flush=True)

    loss_fs = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="fused")
    xd = jnp.asarray(x)
    batch_sc = {"x": xd, "pod_modes": p.modes, "x_sq": jnp.sum(xd * xd)}
    batch_sc["x_hi"], batch_sc["x_lo"] = split_snapshots(xd)
    scan_chunk = train.make_train_chunk(
        loss_fs, desmo.param_groups(params), cfg, unroll=cfg.scan_unroll
    )
    s1 = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sps_sc = timed(scan_chunk, s1, batch_sc)
    print(f"scanned fused    {sps_sc:10.0f} steps/s", flush=True)
    print(f"speedup          {sps_mk / sps_sc:10.2f}x", flush=True)


if __name__ == "__main__":
    main()
