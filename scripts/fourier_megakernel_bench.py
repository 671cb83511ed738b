"""Fourier mega-kernel vs scanned fused chunk on the real TPU (same window).

Covers both presets' shape regimes: fourier_cylinder (resident state) and
fourier_aneurysm (streamed state, n=27000)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_preset(name, steps, reps=5):
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import fourier
    from desmo_tpu.pallas import train_chunk

    cfg = configs.get(name)
    spec = fourier.FourierSpec(
        cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init,
        cfg.n_fourier, cfg.period_init,
    )
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0, period_steps=cfg.period_init)
    p = pod.pod(x, cfg.r)
    params = fourier.init_params(spec)

    batch = train_chunk.prepare_batch(x, p.modes, bt=512, bm=128)

    # numerics: 50 steps mega-kernel vs factored scan
    fused = train_chunk.make_fused_train_chunk(spec, cfg, bt=512)
    s0 = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sk, mk = fused(s0, batch, num_steps=50)
    loss_fn = fourier.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    ref_chunk = train.make_train_chunk(loss_fn, fourier.param_groups(params), cfg)
    sr = jax.tree.map(jnp.array, train.init_state(params, cfg))
    sr, mr = ref_chunk(sr, batch, num_steps=50)
    tot_k = np.asarray(mk["total"])
    tot_r = np.asarray(mr["total"])
    rel = np.max(np.abs(tot_k - tot_r) / np.abs(tot_r))
    print(f"[{name}] trace max rel dev vs factored scan (50 steps): {rel:.2e}", flush=True)

    def timed(run, state, tag):
        state, mets = run(state, batch, num_steps=steps)
        _ = float(np.asarray(mets["rec"])[-1])
        sps = []
        for _i in range(reps):
            t0 = time.perf_counter()
            state, mets = run(state, batch, num_steps=steps)
            last = float(np.asarray(mets["rec"])[-1])
            sps.append(steps / (time.perf_counter() - t0))
        assert np.isfinite(last), "diverged"
        med = float(np.median(sps))
        print(f"[{name}] {tag}: median {med:.0f} steps/s "
              f"(min {min(sps):.0f}, max {max(sps):.0f})", flush=True)
        return med

    s1 = jax.tree.map(jnp.array, train.init_state(params, cfg))
    timed(fused, s1, "mega-kernel")
    s2 = jax.tree.map(jnp.array, train.init_state(params, cfg))
    timed(ref_chunk, s2, "scanned factored")


def main():
    bench_preset("fourier_cylinder", steps=2000)
    bench_preset("fourier_aneurysm", steps=400)


if __name__ == "__main__":
    main()
