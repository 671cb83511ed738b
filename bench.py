"""Benchmark: DESMO optimizer-step throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Primary metric = the cylinder_flow preset (n=3961, m=1001, r=4, P=3, full
batch) against the reference PyTorch run's ~28 steps/s on 1 GPU (BASELINE.md
"cylinder_flow: optimizer steps/sec", derived from checkpoint timestamps in
DESMO/cylinder_flow/DESMO.out). Extras: dispersion of the median (the chip is
time-shared; see CLAUDE.md) and ALL other presets — aneurysm/channel/
fourier_*/ae — each with its own reference baseline from the shipped logs.
"""

import json
import time

import numpy as np

METRIC_HEADLINE = (
    "cylinder_flow full-batch optimizer steps/sec (n=3961, m=1001, r=4, P=3)"
)

# Reference steps/s per preset, from checkpoint timestamps in the shipped
# training logs (BASELINE.md). The AE script's log is not shipped -> no
# baseline; its ratio is reported as null.
BASELINES = {
    "cylinder": 28.0,
    "aneurysm": 3.5,
    "channel": 5.2,
    "fourier_cylinder": 18.0,
    "fourier_aneurysm": 3.2,
    "ae_cylinder": None,
}


def bench_preset(preset: str, steps: int, reps: int):
    """Median + IQR steps/s over `reps` timed chunks of `steps` epochs.

    NOTE: on the tunneled TPU runtime, block_until_ready does not synchronize
    and identical calls are memoized; fetching a result value is the only
    reliable fence, and the evolving state guarantees fresh execution.
    """
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, pod, runner, train
    from desmo_tpu.io import synthetic

    cfg = configs.get(preset)
    spec, params, loss_fn, groups = runner.build_model(cfg)
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)

    from desmo_tpu.pallas import train_chunk as tc

    # the same chunk-selection AND batch-prep policies as runner.run
    train_chunk = tc.select_chunk(spec, cfg)
    batch = runner.prepare_chunk_batch(
        cfg, x,
        pod_modes=None if cfg.variant == "ae" else pod.pod(x, cfg.r).modes,
        chunk=train_chunk,
    )
    if train_chunk is None:
        train_chunk = train.make_train_chunk(loss_fn, groups, cfg, unroll=cfg.scan_unroll)
    state = jax.tree.map(jnp.array, train.init_state(params, cfg))

    # warmup with the SAME static chunk size (compile)
    state, metrics = train_chunk(state, batch, num_steps=steps)
    rec = float(np.asarray(metrics["rec"])[-1])

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, metrics = train_chunk(state, batch, num_steps=steps)
        rec = float(np.asarray(metrics["rec"])[-1])
        times.append(time.perf_counter() - t0)
    assert np.isfinite(rec), f"{preset}: training diverged during benchmark"
    sps = sorted(steps / np.asarray(times))
    q1, med, q3 = np.percentile(sps, [25, 50, 75])
    return {"median": round(float(med), 2), "iqr": [round(float(q1), 2), round(float(q3), 2)], "n": reps}


def bench_ensemble(preset: str, steps: int, reps: int):
    """Seed-packed mega-kernel throughput: S models in one pallas_call.

    Returns packed steps/s spread + S, or None when the pack doesn't apply.
    The headline claim (S seeds at ~1.0x single-seed cost) is judged against
    a single-seed median measured in the SAME chip window (the caller probes
    it immediately before this) — cross-window timings differ ~20x."""
    import jax
    import jax.numpy as jnp

    from desmo_tpu import configs, ensemble, pod, runner
    from desmo_tpu.io import synthetic
    from desmo_tpu.pallas import train_chunk as tc

    cfg = configs.get(preset)
    spec, params, loss_fn, groups = runner.build_model(cfg)
    # largest seed count the KERNEL packs (<= 8 scheduler rows; lane bound)
    S = next(
        (
            s
            for s in range(ensemble.max_seeds_packed(spec), 1, -1)
            if tc.supports_packed(spec, cfg, s)
        ),
        0,
    )
    if S < 2:
        return {"skipped": f"packed kernel supports <2 seeds for {preset}"}
    x = synthetic.cylinder_wake(cfg.n, cfg.m, seed=0)
    batch = tc.prepare_batch(x, pod.pod(x, cfg.r).modes)
    # go through the central selection policy (CLAUDE.md: don't re-roll it);
    # None = the policy declines (non-TPU backend, chunk_method override)
    chunk = tc.select_ensemble_chunk(spec, cfg, S)
    if chunk is None:
        return {
            "skipped": "select_ensemble_chunk declined "
            "(non-TPU backend or chunk_method override)"
        }
    eparams = ensemble.init_params(spec, S, seed=0, phi_sigma=0.02)
    state = jax.tree.map(jnp.array, ensemble.init_state(eparams, cfg, S))
    state, mets = chunk(state, batch, num_steps=steps)  # compile
    tot = float(np.asarray(mets["total_s"])[-1].sum())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, mets = chunk(state, batch, num_steps=steps)
        tot = float(np.asarray(mets["total_s"])[-1].sum())
        times.append(time.perf_counter() - t0)
    assert np.isfinite(tot), f"{preset} ensemble: training diverged"
    sps = sorted(steps / np.asarray(times))
    q1, med, q3 = np.percentile(sps, [25, 50, 75])
    return {
        "n_seeds": S,
        "median": round(float(med), 2),
        "iqr": [round(float(q1), 2), round(float(q3), 2)],
        "n": reps,
    }


def main() -> None:
    plans = {
        "cylinder": (2000, 7),
        "aneurysm": (500, 5),
        "channel": (800, 5),
        "fourier_cylinder": (2000, 5),
        "fourier_aneurysm": (500, 5),
        "ae_cylinder": (500, 5),
    }
    results = {}
    for preset, (steps, reps) in plans.items():
        results[preset] = bench_preset(preset, steps=steps, reps=reps)

    def entry(preset, label):
        from desmo_tpu import configs, flops

        base = BASELINES[preset]
        med = results[preset]["median"]
        return {
            "metric": label,
            "value": med,
            "unit": "steps/s",
            "vs_baseline": round(med / base, 2) if base else None,
            "spread": results[preset],
            # MFU-grade fields: useful = unpadded single-pass FLOPs;
            # executed = padded x bf16-passes; pct_of_3pass_peak = useful
            # throughput vs the v5e 197/3 TFLOP/s fp32-grade ceiling
            "mfu": flops.mfu(med, flops.step_flops(configs.get(preset))),
        }

    out = entry("cylinder", METRIC_HEADLINE)
    out["presets"] = {
        "aneurysm": entry("aneurysm", "aneurysm steps/sec (n=27000, m=1000, r=4, P=2)"),
        "channel": entry("channel", "turbulent_channel steps/sec (n=16384, m=1000, r=4, P=2)"),
        "fourier_cylinder": entry("fourier_cylinder", "Fourier cylinder steps/sec (r=2, P=2, nF=10)"),
        "fourier_aneurysm": entry("fourier_aneurysm", "Fourier aneurysm steps/sec (r=2, P=2, nF=30)"),
        "ae_cylinder": entry("ae_cylinder", "AE cylinder steps/sec (r=2, P=2; no reference log)"),
    }
    # Beyond-reference capability: S-seed multi-start at ~the cost of one
    # step (seed-packed mega-kernel, lanes the MXU padded anyway). The cost
    # ratio needs a SAME-WINDOW single-seed reference: the chip is
    # time-shared and throughput varies ~20x between windows (CLAUDE.md), so
    # the preset median measured minutes earlier is NOT comparable — re-probe
    # the single-seed chunk immediately before the packed one.
    def ensemble_entry(preset, steps):
        # never let the ensemble extra block the headline — but never hide a
        # failure either (round-4 verdict: a swallowed exception erased the
        # packed-fourier claim's only hardware evidence)
        try:
            single = bench_preset(preset, steps=steps, reps=3)["median"]
            ens = bench_ensemble(preset, steps=steps, reps=5)
        except Exception as e:
            return {"error": repr(e)}
        if "skipped" in ens:
            return ens
        return {
            "metric": f"{preset} seed-packed mega-kernel, S={ens['n_seeds']} models/kernel",
            "value": round(ens["n_seeds"] * ens["median"], 2),
            "unit": "seed-steps/s",
            "packed_steps_per_sec": ens["median"],
            "single_seed_same_window": single,
            "cost_vs_single_x": round(single / ens["median"], 3),
            "seed_throughput_vs_sequential_x": round(
                ens["n_seeds"] * ens["median"] / single, 2
            ),
            "spread": ens,
        }

    # ALWAYS present: a measurement, {"skipped": why} or {"error": repr} —
    # an absent key is indistinguishable from "never ran"
    out["ensemble"] = ensemble_entry("aneurysm", steps=500)
    # fourier variant: seeds' series channels stack as kernel rows (S<=8)
    out["ensemble_fourier"] = ensemble_entry("fourier_cylinder", steps=800)
    print(json.dumps(out))
    print(_compact_line(out))


def _compact_line(out: dict) -> str:
    """Tail-proof summary: the driver stores only a 2000-char tail of bench
    stdout, and round 4 lost the cylinder headline to that truncation (it was
    the FIRST field of one long line). Emit a second, compact (<1 KB) JSON
    line AFTER the full record carrying the headline + per-preset medians +
    speedups + ensemble cost ratios, so the tail always contains the numbers
    that matter. Consumers reading the LAST stdout line still get the
    one-JSON-line contract (metric/value/unit/vs_baseline)."""
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "vs_baseline": out["vs_baseline"],
        "presets": {
            name: [p["value"], p["vs_baseline"]]
            for name, p in out.get("presets", {}).items()
        },
    }
    for key in ("ensemble", "ensemble_fourier"):
        e = out.get(key)
        if e is None:
            continue
        if "error" in e or "skipped" in e:
            compact[key] = e.get("error") or e.get("skipped")
        else:
            compact[key] = {
                "n_seeds": e["spread"]["n_seeds"],
                "cost_vs_single_x": e["cost_vs_single_x"],
                "seed_throughput_x": e["seed_throughput_vs_sequential_x"],
            }
    return json.dumps(compact)


def _tpu_alive(timeout_s: float = 240.0) -> bool:
    """Probe the tunneled TPU in a SUBPROCESS with a hard timeout: during the
    observed 2026-08-17/18 outage (>14 h) backend init HANGS rather than
    erroring, so an in-process check would hang bench.py forever. The probe
    asserts the backend really is the TPU — a transient init error can make
    JAX fall back to CPU with only a warning, where the matmul would
    'succeed' and a naive probe would report the chip alive."""
    import subprocess
    import sys as _sys

    code = (
        # honor a CLI-forced platform (python -m desmo_tpu bench --platform
        # cpu sets DESMO_BENCH_PLATFORM); default = assert the real TPU
        "import os, jax;"
        "p=os.environ.get('DESMO_BENCH_PLATFORM');"
        "d=os.environ.get('DESMO_BENCH_CPU_DEVICES');"
        "p and jax.config.update('jax_platforms', p);"
        "d and jax.config.update('jax_num_cpu_devices', int(d));"
        "import jax.numpy as jnp;"
        "assert jax.default_backend() == (p or 'tpu'), jax.default_backend();"
        "x=(jnp.ones((128,128))@jnp.ones((128,128))).sum();"
        "assert float(x)==128*128*128"
    )
    try:
        return (
            subprocess.run(
                [_sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True,
            ).returncode
            == 0
        )
    except subprocess.TimeoutExpired:
        return False


def _degraded_line(reason: str) -> None:
    """The one-JSON-line contract, honored even when the chip is unreachable:
    value null + an explicit reason beats a hang or a bare traceback. Metric
    string identical to the healthy headline so consumers keying on it see a
    null datapoint, not a different series."""
    print(
        json.dumps(
            {
                "metric": METRIC_HEADLINE,
                "value": None,
                "unit": "steps/s",
                "vs_baseline": None,
                "error": reason,
            }
        )
    )


def _watchdog() -> None:
    """Parent-side entry: probe the chip (cheap, bounded), then run main() as
    a CHILD under a hard wall-clock cap so a mid-run tunnel drop cannot hang
    the round-end bench — the retry loop catches exceptions, but the observed
    outage mode is a HANG at backend init / device fetch. Worst-case wall
    before the degraded line: ~29 min dead-chip (5 x 240 s probe + 555 s of
    backoff sleeps), or probe time + the 60-min child cap mid-run."""
    import os
    import subprocess
    import sys as _sys

    _waits = (15, 60, 180, 300)
    alive = False
    for wait in (*_waits, 0):
        alive = _tpu_alive()
        if alive:
            break
        time.sleep(wait)
    if not alive:
        _degraded_line(
            "TPU unreachable: backend init hung/failed through ~29 min of "
            "probes+backoff (tunneled chip outage; see docs/RESULTS.md)"
        )
        raise SystemExit(0)
    env = {**os.environ, "DESMO_BENCH_CHILD": "1"}
    for attempt in range(2):
        try:
            # child stdout passes straight through: the JSON line is printed
            # by the child itself
            rc = subprocess.run(
                [_sys.executable, os.path.abspath(__file__)], env=env,
                timeout=3600,
            ).returncode
        except subprocess.TimeoutExpired:
            _degraded_line(
                "bench timed out after 60 min (tunnel likely dropped mid-run)"
            )
            raise SystemExit(1)
        if rc == 0:
            raise SystemExit(0)
        if attempt == 0:
            time.sleep(120)  # transient FailedPrecondition: one more try
    _degraded_line(f"bench child failed twice (last exit code {rc})")
    raise SystemExit(1)


if __name__ == "__main__":
    import os as _os

    # CLI-forced platform (cmd_bench): must land in THIS process (probe and
    # main children inherit the env) before any backend touch
    _forced = _os.environ.get("DESMO_BENCH_PLATFORM")
    if _forced:
        import jax as _jax

        _jax.config.update("jax_platforms", _forced)
        _nd = _os.environ.get("DESMO_BENCH_CPU_DEVICES")
        if _nd:
            _jax.config.update("jax_num_cpu_devices", int(_nd))

    if _os.environ.get("DESMO_BENCH_CHILD") == "1":
        # in-child retry for transient runtime errors; a hang here is the
        # parent watchdog's problem
        _waits = (15, 60, 180)
        for attempt, wait in enumerate((*_waits, 0)):
            try:
                main()
                break
            except Exception:
                if attempt == len(_waits):
                    raise
                time.sleep(wait)
    else:
        _watchdog()
