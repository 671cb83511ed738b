"""Multi-chip scaling projection for the sharded mega-kernel (VERDICT r3 #5).

Real multi-chip hardware is unavailable (one tunneled v5e chip), so the
projection is built from single-chip measurements plus an ICI model:

  t_step(d) = L  +  C * n/d  +  psum(d)

* ``L`` (per-step fixed cost: pallas launch + replicated temporal/coef/omega
  update + scan-step overhead) and ``C`` (per-row tile compute) are measured
  on the REAL chip by running the sharded chunk on a 1-device 'space' mesh at
  two problem heights and solving the 2x2 linear system — d=1 makes every
  psum a no-op, so what remains is exactly L + C*n.
* ``psum(d)`` is modeled as a ring all-reduce of the per-step partials
  (ax (128, m_pad) + ga/auga (128, 128) + acc (8, 128), fp32):
  2*(d-1)/d * bytes / BW + (d-1) * hop latency. BW/latency assumptions are
  printed with the table (v5e ICI, per the public scaling-book numbers).

Usage: python scripts/shard_projection.py [--preset aneurysm] [--steps 200]
Prints one JSON report (also a markdown table with --md).
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# v5e ICI assumptions (public figures; one-way per-link bandwidth on the 2D
# torus, conservative effective all-reduce bandwidth + per-hop latency).
ICI_BW_BYTES = 45e9  # effective ring all-reduce bandwidth, bytes/s
ICI_HOP_LAT = 1e-6  # per-hop latency, s


def measure_sharded_step_us(cfg, spec, x, modes, n_rows, steps, reps=5):
    """Median per-step time of the sharded chunk on a 1-device 'space' mesh,
    with the problem truncated to n_rows spatial rows."""
    import jax
    import jax.numpy as jnp

    from desmo_tpu import train
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import shard_step, train_chunk
    from desmo_tpu.parallel import make_mesh

    import dataclasses

    cfg_n = dataclasses.replace(cfg, n=n_rows)
    spec_n = dataclasses.replace(spec, n=n_rows)
    xs = x[:n_rows]
    ms = modes[:n_rows]
    mesh = make_mesh(n_space=1, n_time=1)
    batch = train_chunk.prepare_batch(xs, ms, bt=shard_step._BT_DEFAULT, n_mult=shard_step._BT_DEFAULT)
    chunk = shard_step.make_sharded_fused_chunk(spec_n, cfg_n, mesh, interpret=False)

    def fresh_state():
        params = desmo.init_params(spec_n)
        return jax.tree.map(jnp.array, train.init_state(params, cfg_n))

    with jax.sharding.set_mesh(mesh):
        state = fresh_state()
        state, mets = chunk(state, batch, num_steps=steps)  # warmup/compile
        _ = float(np.asarray(mets["total"])[-1])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, mets = chunk(state, batch, num_steps=steps)
            _ = float(np.asarray(mets["total"])[-1])  # host fetch fences
            ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / steps * 1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="aneurysm")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()

    from desmo_tpu import configs, pod
    from desmo_tpu.io import synthetic
    from desmo_tpu.models import desmo
    from desmo_tpu.pallas import train_chunk

    cfg = configs.get(args.preset)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    p = pod.pod(x, cfg.r)
    spec = desmo.DesmoSpec(cfg.n, cfg.m, cfg.r, cfg.poly_order, cfg.omega_init)

    # Two heights bracketing the per-device share at d=1..16; solve L, C.
    n_hi = cfg.n
    bt = 512
    n_lo = max(bt, (cfg.n // 8) // bt * bt)
    t_hi = measure_sharded_step_us(cfg, spec, x, p.modes, n_hi, args.steps)
    t_lo = measure_sharded_step_us(cfg, spec, x, p.modes, n_lo, args.steps)
    C = (t_hi - t_lo) / (n_hi - n_lo)  # us per row
    L = t_lo - C * n_lo  # us fixed

    # psum payload per step (fp32): ax (128, m_pad) + ga/auga (128,128) + acc
    m_pad = -(-cfg.m // 128) * 128
    payload = 4 * (128 * m_pad + 2 * 128 * 128 + 8 * 128)

    # single-chip mega-kernel baseline for reference
    from desmo_tpu import train
    import jax
    import jax.numpy as jnp

    fused = train_chunk.make_fused_train_chunk(spec, cfg, interpret=False)
    batch = train_chunk.prepare_batch(x, p.modes, bt=train_chunk._BT_DEFAULT)
    params = desmo.init_params(spec)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))
    state, mets = fused(state, batch, num_steps=args.steps)
    _ = float(np.asarray(mets["total"])[-1])
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        state, mets = fused(state, batch, num_steps=args.steps)
        _ = float(np.asarray(mets["total"])[-1])
        ts.append(time.perf_counter() - t0)
    t_mega = sorted(ts)[2] / args.steps * 1e6

    rows = []
    for d in (1, 2, 4, 8, 16):
        psum = 0.0
        if d > 1:
            psum = (2 * (d - 1) / d * payload / ICI_BW_BYTES + (d - 1) * ICI_HOP_LAT) * 1e6
        t = L + C * cfg.n / d + psum
        rows.append(
            {
                "devices": d,
                "launch_fixed_us": round(L, 1),
                "compute_us": round(C * cfg.n / d, 1),
                "psum_us": round(psum, 1),
                "step_us": round(t, 1),
                "steps_per_s": round(1e6 / t),
                "speedup_vs_megakernel": round(t_mega / t, 2),
            }
        )

    report = {
        "preset": args.preset,
        "measured": {
            "sharded_1dev_full_us": round(t_hi, 1),
            "sharded_1dev_small_us": round(t_lo, 1),
            "n_full": n_hi,
            "n_small": n_lo,
            "fixed_L_us": round(L, 1),
            "per_row_C_ns": round(C * 1e3, 3),
            "megakernel_step_us": round(t_mega, 1),
        },
        "psum_model": {
            "payload_bytes": payload,
            "ici_bw_bytes_per_s": ICI_BW_BYTES,
            "hop_latency_s": ICI_HOP_LAT,
        },
        "projection": rows,
    }
    print(json.dumps(report))
    if args.md:
        print("\n| d | fixed (us) | compute (us) | psum (us) | step (us) | steps/s | vs mega-kernel |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(
                f"| {r['devices']} | {r['launch_fixed_us']} | {r['compute_us']} "
                f"| {r['psum_us']} | {r['step_us']} | {r['steps_per_s']} "
                f"| {r['speedup_vs_megakernel']}x |"
            )


if __name__ == "__main__":
    main()
