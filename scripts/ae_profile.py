"""Attribution profile of the AE-variant training step on the real TPU.

Times the full scanned chunk and isolated jitted sub-computations (same
window; evolving inputs + host fetch per timed call, per CLAUDE.md). Also
compares MLP precision HIGHEST (6-pass) vs HIGH (3-pass).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import autoencoder as ae

    cfg = configs.get("ae_cylinder")
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    xd = jnp.asarray(x)
    params = ae.init_params(spec)
    steps = 300

    def timed_chunk(loss_fn, reps=5):
        chunk = train.make_train_chunk(loss_fn, ae.param_groups(params), cfg)
        state = jax.tree.map(jnp.array, train.init_state(params, cfg))
        batch = {"x": xd, "x_sq": jnp.sum(xd * xd)}
        state, mets = chunk(state, batch, num_steps=steps)
        _ = float(np.asarray(mets["rec"])[-1])
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            state, mets = chunk(state, batch, num_steps=steps)
            _ = float(np.asarray(mets["rec"])[-1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / steps * 1e6

    def timed_grad(fn, p0, reps=5, scale=1e-6):
        g = jax.jit(jax.grad(fn))
        p = jax.tree.map(jnp.array, p0)
        p = g(p)  # warmup; output becomes next input (evolving)
        _ = float(np.asarray(jax.tree.leaves(p)[0]).reshape(-1)[0])
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            for _k in range(10):
                p = jax.tree.map(lambda a, b: a + scale * b, p0, g(p))
            _ = float(np.asarray(jax.tree.leaves(p)[0]).reshape(-1)[0])
            ts.append((time.perf_counter() - t0) / 10)
        return sorted(ts)[len(ts) // 2] * 1e6

    loss = ae.build_loss(spec, cfg.beta, cfg.l1_lambda, cfg.ae_beta, method="factored")
    base = timed_chunk(loss)
    print(f"full AE chunk step           {base:8.1f} us", flush=True)

    # isolated pieces (value+grad of scalarized outputs)
    def enc_only(p):
        lat, rec = ae.encode_decode(p, xd)
        return jnp.sum(lat * lat)

    def enc_dec_mse(p):
        lat, rec = ae.encode_decode(p, xd)
        return jnp.sum((rec - xd) ** 2) + jnp.sum(lat * lat)

    def full_loss(p):
        return loss(p, {"x": xd, "x_sq": jnp.sum(xd * xd)})[0]

    print(f"encoder fwd+bwd              {timed_grad(enc_only, params):8.1f} us", flush=True)
    print(f"enc+dec+aemse fwd+bwd        {timed_grad(enc_dec_mse, params):8.1f} us", flush=True)
    print(f"full loss fwd+bwd            {timed_grad(full_loss, params):8.1f} us", flush=True)

    # precision experiment: the shipped default is HIGH (3-pass); patch to
    # HIGHEST (6-pass, the pre-round-3 default) to show the headroom that
    # motivated the change (702 -> 474 us/step measured 2026-08-17)
    import desmo_tpu.models.autoencoder as ae_mod

    orig = ae_mod._mlp

    def mlp_highest(params, prefix, x, n_layers):
        for i in range(n_layers):
            x = jnp.dot(x, params[f"{prefix}_w{i}"], precision=jax.lax.Precision.HIGHEST)
            x = x + params[f"{prefix}_b{i}"]
            if i < n_layers - 1:
                x = jax.nn.relu(x)
        return x

    ae_mod._mlp = mlp_highest
    try:
        loss_h = ae.build_loss(spec, cfg.beta, cfg.l1_lambda, cfg.ae_beta, method="factored")
        hi = timed_chunk(loss_h)
        print(f"full AE chunk, MLP HIGHEST   {hi:8.1f} us   (delta vs HIGH {base - hi:+.1f})", flush=True)
    finally:
        ae_mod._mlp = orig


if __name__ == "__main__":
    main()
