"""Ablation profile of the cylinder training step on the real TPU.

Times progressively smaller pieces of the compiled step to attribute the
per-step budget (the chip is time-shared: medians over many chunks; identical
jitted calls are memoized on axon, so every timed chunk evolves its state and
fetches a value to host as the fence — see CLAUDE.md).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _median_time(fn, state, batch, steps, reps=5):
    # warmup/compile
    state, out = fn(state, batch, steps)
    _ = float(np.asarray(out)[-1] if np.ndim(out) else np.asarray(out))
    times = []
    for _i in range(reps):
        t0 = time.perf_counter()
        state, out = fn(state, batch, steps)
        _ = float(np.asarray(out)[-1] if np.ndim(out) else np.asarray(out))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] / steps


def main():
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
    xd = jnp.asarray(x)
    batch = {"x": xd, "pod_modes": p.modes, "x_sq": jnp.sum(xd * xd)}
    from desmo_tpu.pallas import split_snapshots

    batch["x_hi"], batch["x_lo"] = split_snapshots(xd)
    groups = desmo.param_groups(params)
    steps = 2000
    results = {}

    # 1. full current step (fused kernel + dict + adamax + sched)
    loss_fused = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="fused")
    chunk = train.make_train_chunk(loss_fused, groups, cfg)
    st = jax.tree.map(jnp.array, train.init_state(params, cfg))
    results["full_fused"] = _median_time(
        lambda s, b, n: _metrics_last(chunk(s, b, num_steps=n)), st, batch, steps
    )

    # 2. full step, factored XLA loss (no pallas)
    loss_fac = desmo.build_loss(spec, cfg.beta, cfg.l1_lambda, method="factored")
    chunk2 = train.make_train_chunk(loss_fac, groups, cfg)
    st = jax.tree.map(jnp.array, train.init_state(params, cfg))
    results["full_factored"] = _median_time(
        lambda s, b, n: _metrics_last(chunk2(s, b, num_steps=n)), st, batch, steps
    )

    # 3. kernel-only loop: scan of fused MSE fwd+bwd on evolving A-sized params,
    #    no library/trig/concat (A is a raw (n, K) parameter)
    from desmo_tpu.pallas import factored_mse_fused_split

    K = spec.num_poly_terms + 3 * spec.r

    def kernel_loss(prm, b):
        val = factored_mse_fused_split(
            prm["a"], prm["b"], b["x_hi"], b["x_lo"], b["x_sq"], False
        )
        return val, {"rec": val, "ortho": val * 0, "l1": val * 0}

    kparams = {
        "a": jnp.ones((cfg.n, K), jnp.float32),
        "b": jnp.ones((K, cfg.m), jnp.float32),
    }
    kgroups = {"a": "phi", "b": "z"}
    chunk3 = train.make_train_chunk(kernel_loss, kgroups, cfg)
    st = jax.tree.map(jnp.array, train.init_state(kparams, cfg))
    results["kernel_plus_adamax"] = _median_time(
        lambda s, b, n: _metrics_last(chunk3(s, b, num_steps=n)), st, batch, steps
    )

    # 4. dictionary-only loop: build A,B and reduce, no X contact
    def dict_loss(prm, b):
        from desmo_tpu.models.desmo import spatial_dictionary, temporal_matrix

        A, latent = spatial_dictionary(prm, b["pod_modes"], spec.factor_table())
        B = temporal_matrix(prm)
        val = jnp.sum(A * A) * 1e-12 + jnp.sum(B * B) * 1e-12
        from desmo_tpu import losses

        ortho = losses.orthogonality(latent)
        return val + 1e-3 * ortho, {"rec": val, "ortho": ortho, "l1": val * 0}

    chunk4 = train.make_train_chunk(dict_loss, groups, cfg)
    st = jax.tree.map(jnp.array, train.init_state(params, cfg))
    results["dict_plus_adamax"] = _median_time(
        lambda s, b, n: _metrics_last(chunk4(s, b, num_steps=n)), st, batch, steps
    )

    # 5. adamax/sched-only loop: trivial loss over the packed params
    def tiny_loss(prm, b):
        val = sum(jnp.sum(v * v) for v in prm.values()) * 1e-12
        return val, {"rec": val, "ortho": val * 0, "l1": val * 0}

    chunk5 = train.make_train_chunk(tiny_loss, groups, cfg)
    st = jax.tree.map(jnp.array, train.init_state(params, cfg))
    results["adamax_sched_only"] = _median_time(
        lambda s, b, n: _metrics_last(chunk5(s, b, num_steps=n)), st, batch, steps
    )

    for k, v in results.items():
        print(f"{k:24s} {v * 1e6:9.2f} us/step   {1 / v:10.0f} steps/s")


def _metrics_last(out):
    state, metrics = out
    return state, metrics["rec"]


if __name__ == "__main__":
    main()
