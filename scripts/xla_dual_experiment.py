"""Is plain XLA faster than pallas_call for the dual contraction on this
runtime? (kernel_matrix showed ~40us fixed overhead per pallas_call: 1-pass
== 3-pass == single-product.) Variants, same window:

  pallas3   : shipped dual_contractions_split
  xla3      : ax/xb as 3 bf16 jnp.dots each on pre-split planes
  xla3_T    : same but xb via (b @ x.T).T formulations? no — xb = x @ b.T
  xla1      : single-pass bf16 (floor probe)
  xla_f32   : jnp.dot fp32 HIGHEST on raw x (6-pass, 1 read)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import dual_gemm

    cfg = configs.get("cylinder")
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)
    n, m = cfg.n, cfg.m
    K = spec.num_poly_terms + 3 * spec.r
    x = synthetic.cylinder_wake(n, m, seed=0)
    xd = jnp.asarray(x)
    x_hi, x_lo = dual_gemm.split_snapshots(xd)
    x_hi = x_hi[:n, :m]
    x_lo = x_lo[:n, :m]
    steps = 2000
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((n, K)), jnp.float32)
    b0 = jnp.asarray(rng.standard_normal((K, m)), jnp.float32)

    def timed(fn, carry, reps=5):
        run = jax.jit(lambda c: jax.lax.scan(fn, c, None, length=steps))
        carry = run(carry)[0]
        _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[0])
        ts = []
        for _i in range(reps):
            t0 = time.perf_counter()
            carry = run(carry)[0]
            _ = float(np.asarray(jax.tree.leaves(carry)[0]).reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2] / steps

    def split(v):
        hi = v.astype(jnp.bfloat16)
        return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(u, v):
        return jnp.dot(u, v, preferred_element_type=jnp.float32)

    # pallas
    xph, xpl = dual_gemm.split_snapshots(xd)

    def body_pallas(carry, _):
        a, b = carry
        ax, xb = dual_gemm.dual_contractions_split(a, b, xph, xpl, False)
        return (a + 1e-12 * xb, b + 1e-12 * ax), None

    print(f"pallas3   {timed(body_pallas, (a0, b0)) * 1e6:8.2f} us/step", flush=True)

    # xla 3-pass
    def body_xla3(carry, _):
        a, b = carry
        a_hi, a_lo = split(a)
        b_hi, b_lo = split(b)
        ax = d(a_hi.T, x_hi) + d(a_hi.T, x_lo) + d(a_lo.T, x_hi)
        xb = d(x_hi, b_hi.T) + d(x_hi, b_lo.T) + d(x_lo, b_hi.T)
        return (a + 1e-12 * xb, b + 1e-12 * ax), None

    print(f"xla3      {timed(body_xla3, (a0, b0)) * 1e6:8.2f} us/step", flush=True)

    # xla 1-pass
    def body_xla1(carry, _):
        a, b = carry
        ax = d(a.astype(jnp.bfloat16).T, x_hi)
        xb = d(x_hi, b.astype(jnp.bfloat16).T)
        return (a + 1e-12 * xb, b + 1e-12 * ax), None

    print(f"xla1      {timed(body_xla1, (a0, b0)) * 1e6:8.2f} us/step", flush=True)

    # xla fp32 HIGHEST on raw x
    def body_f32(carry, _):
        a, b = carry
        ax = jnp.dot(a.T, xd, precision=jax.lax.Precision.HIGHEST)
        xb = jnp.dot(xd, b.T, precision=jax.lax.Precision.HIGHEST)
        return (a + 1e-12 * xb, b + 1e-12 * ax), None

    print(f"xla_f32   {timed(body_f32, (a0, b0)) * 1e6:8.2f} us/step", flush=True)

    # xla DEFAULT precision on raw f32 x (XLA picks; on v5e this is 1-pass bf16? probe)
    def body_fdef(carry, _):
        a, b = carry
        ax = jnp.dot(a.T, xd)
        xb = jnp.dot(xd, b.T)
        return (a + 1e-12 * xb, b + 1e-12 * ax), None

    print(f"xla_def   {timed(body_fdef, (a0, b0)) * 1e6:8.2f} us/step", flush=True)

    # correctness of xla3 vs fp64 oracle
    a_hi, a_lo = split(a0)
    b_hi, b_lo = split(b0)
    ax3 = d(a_hi.T, x_hi) + d(a_hi.T, x_lo) + d(a_lo.T, x_hi)
    ax64 = np.asarray(a0, np.float64).T @ np.asarray(xd, np.float64)
    rel = np.abs(np.asarray(ax3) - ax64).max() / np.abs(ax64).max()
    print(f"xla3 rel err vs fp64: {rel:.2e}")


if __name__ == "__main__":
    main()
