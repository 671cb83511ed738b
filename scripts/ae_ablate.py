"""In-scan attribution of the AE training step (VERDICT r3 #3).

``scripts/ae_profile.py``'s isolated-grad timings are useless on the tunneled
chip (per-dispatch latency ~3 ms swamps 0.4 ms of compute), so attribution is
done the same way as the mega-kernel ablation harness: build stubbed loss
variants, run each through the SAME scanned chunk (one dispatch per chunk),
and difference the step times. Timing is data-independent, so stubs are fine.

Variants:
  full    - shipped AE loss (factored dictionary MSE + AE MSE + ortho + L1)
  nodict  - dictionary/A/B/rec term stubbed (keeps the whole MLP + AE MSE)
  nomlp   - MLP stubbed (latent = x[:, :2], ae_rec skipped); dictionary only
  bigonly - only the two dominant GEMM sites (enc layer0 m->256, dec last
            256->m) + AE MSE; funnel layers stubbed by slicing/tiling
  floor   - near-zero loss: measures packed-Adamax + scheduler + scan overhead
  aefact  - full loss, but the AE MSE factored through the last decoder layer
            (never materializes the (n, m) decode). Measured -40.8 us/step and
            SHIPPED as the default perf path (models/autoencoder.build_loss),
            so 'full' now equals 'aefact'; the local naive-decode history is
            kept for the attribution table in docs/RESULTS.md.

Prints a table + attribution summary. Run on the real TPU.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, losses, train
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import autoencoder as ae
    from desmo_tpu.models import desmo as desmo_model

    cfg = configs.get("ae_cylinder")
    spec = ae.AESpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    xd = jnp.asarray(x)
    params = ae.init_params(spec)
    factors = spec.factor_table()
    beta, lam, ae_beta = cfg.beta, cfg.l1_lambda, cfg.ae_beta
    nl = len(ae.ENCODER_WIDTHS) + 1
    steps = 300

    # the SHIPPED batch prep: runner.prepare_chunk_batch always precomputes
    # x_colsum for the AE variant, so 'full' (= the shipped factored AE-MSE)
    # must be timed WITH it — without it the loss recomputes the (n,m)
    # column sum inside the compiled step and the 'aefact delta' overstates
    # the factoring win. Stub variants ignore the extra keys.
    batch = {"x": xd, "x_sq": jnp.sum(xd * xd), "x_colsum": jnp.sum(xd, axis=0)}

    def timed(loss_fn, reps=5):
        chunk = train.make_train_chunk(loss_fn, ae.param_groups(params), cfg)
        state = jax.tree.map(jnp.array, train.init_state(params, cfg))
        state, mets = chunk(state, batch, num_steps=steps)
        _ = float(np.asarray(mets["rec"])[-1])
        ts = []
        for _ in range(reps):
            state, mets = chunk(state, batch, num_steps=steps)
            _ = float(np.asarray(mets["rec"])[-1])
            t0 = time.perf_counter()
            state, mets = chunk(state, batch, num_steps=steps)
            _ = float(np.asarray(mets["rec"])[-1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / steps * 1e6

    def zero():
        return jnp.zeros(())

    def dict_terms(params, latent, x, x_sq):
        A = ae._dictionary(params, latent, spec, factors)
        B = desmo_model.temporal_matrix(params)
        rec = losses.factored_mse(A, B, x, x_sq)
        return rec

    def mets_of(rec, ortho, l1, aem):
        return {"rec": rec, "ortho": ortho, "l1": l1, "ae": aem}

    HIGH = jax.lax.Precision.HIGH

    # --- variants -----------------------------------------------------------
    full = ae.build_loss(spec, beta, lam, ae_beta, method="factored")

    def nodict(params, batch):
        x = batch["x"]
        latent, ae_rec = ae.encode_decode(params, x)
        aem = losses.mse(ae_rec, x)
        ortho = ae.ae_orthogonality(latent)
        l1 = ae.ae_sparsity_l1(params)
        total = beta * ortho + lam * l1 + ae_beta * aem
        return total, mets_of(zero(), ortho, l1, aem)

    def nomlp(params, batch):
        x = batch["x"]
        latent = x[:, : spec.r] * 1e-3
        rec = dict_terms(params, latent, x, batch["x_sq"])
        ortho = ae.ae_orthogonality(latent)
        l1 = ae.ae_sparsity_l1(params)
        total = rec + beta * ortho + lam * l1
        return total, mets_of(rec, ortho, l1, zero())

    def bigonly(params, batch):
        x = batch["x"]
        h = jax.nn.relu(jnp.dot(x, params["ae_enc_w0"], precision=HIGH) + params["ae_enc_b0"])
        latent = h[:, : spec.r]  # funnel stubbed
        hdec = jnp.tile(latent, (1, 128))  # (n, 256) stub for the last layer
        ae_rec = jnp.dot(hdec, params[f"ae_dec_w{nl-1}"], precision=HIGH) + params[f"ae_dec_b{nl-1}"]
        aem = losses.mse(ae_rec, x)
        total = ae_beta * aem + lam * ae.ae_sparsity_l1(params)
        return total, mets_of(zero(), zero(), zero(), aem)

    def floor(params, batch):
        total = 1e-12 * (jnp.sum(params["c"]) + jnp.sum(params["ae_enc_b0"]))
        return total, mets_of(zero(), zero(), zero(), zero())

    def aefact(params, batch):
        x = batch["x"]
        # encoder + decoder front (through the ReLU into the 256-wide H)
        latent = ae._mlp(params, "ae_enc", x, nl)
        h = latent
        for i in range(nl - 1):
            h = jax.nn.relu(
                jnp.dot(h, params[f"ae_dec_w{i}"], precision=HIGH) + params[f"ae_dec_b{i}"]
            )
        W = params[f"ae_dec_w{nl-1}"]  # (256, m)
        b = params[f"ae_dec_b{nl-1}"]  # (m,)
        n_, m_ = x.shape
        hh = jnp.dot(h.T, h, precision=HIGH)      # (256, 256)
        ww = jnp.dot(W, W.T, precision=HIGH)      # (256, 256)
        hx = jnp.dot(h.T, x, precision=HIGH)      # (256, m)  [big: reads X]
        sh = jnp.sum(h, axis=0)                   # (256,)
        xcol = batch["x_colsum"]                  # (m,) precomputed
        sq = (
            jnp.sum(hh * ww)
            - 2.0 * jnp.sum(hx * W)
            + batch["x_sq"]
            + 2.0 * jnp.dot(jnp.dot(sh, W, precision=HIGH), b)
            - 2.0 * jnp.dot(xcol, b)
            + n_ * jnp.dot(b, b)
        )
        aem = sq / (n_ * m_)
        rec = dict_terms(params, latent, x, batch["x_sq"])
        ortho = ae.ae_orthogonality(latent)
        l1 = ae.ae_sparsity_l1(params)
        total = rec + beta * ortho + lam * l1 + ae_beta * aem
        return total, mets_of(rec, ortho, l1, aem)

    results = {}
    for name, fn in [
        ("full", full), ("nodict", nodict), ("nomlp", nomlp),
        ("bigonly", bigonly), ("floor", floor),
    ]:
        results[name] = timed(fn)
        print(f"{name:10s} {results[name]:8.1f} us/step", flush=True)

    results["aefact"] = timed(aefact)
    print(f"{'aefact':10s} {results['aefact']:8.1f} us/step", flush=True)

    f, nd, nm_, bo, fl = (
        results["full"], results["nodict"], results["nomlp"],
        results["bigonly"], results["floor"],
    )
    print("\nattribution:")
    print(f"  opt+sched+scan floor   {fl:7.1f} us")
    print(f"  dictionary side        {f - nd:7.1f} us   (full - nodict)")
    print(f"  MLP side               {nd - fl:7.1f} us   (nodict - floor)")
    print(f"  big GEMMs (enc0+dec6)  {bo - fl:7.1f} us   (bigonly - floor)")
    print(f"  funnel + residual      {(nd - fl) - (bo - fl):7.1f} us")
    print(f"  aefact delta vs full   {results['aefact'] - f:+7.1f} us")


if __name__ == "__main__":
    main()
