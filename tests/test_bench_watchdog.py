"""bench.py's outage contract: the round-end bench must never hang or emit a
bare traceback — a dead chip yields ONE null-value JSON line keyed on the
same headline metric string as a healthy run (driver/judge consumers key on
it). The TPU paths themselves run on hardware; these tests pin the
watchdog's host-side logic with the probe and child stubbed."""

import json
import os
import subprocess
import sys
import types
from unittest import mock

import pytest


@pytest.fixture()
def bench_mod(monkeypatch):
    sys.path.insert(0, "/root/repo")
    import bench

    # never sleep in tests
    monkeypatch.setattr(
        bench, "time", types.SimpleNamespace(sleep=lambda s: None)
    )
    return bench


def test_dead_chip_emits_null_headline_line(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "_tpu_alive", lambda timeout_s=240.0: False)
    with pytest.raises(SystemExit) as exc:
        bench_mod._watchdog()
    assert exc.value.code == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    line = json.loads(out[0])
    assert line["metric"] == bench_mod.METRIC_HEADLINE
    assert line["value"] is None and line["vs_baseline"] is None
    assert "error" in line


def test_healthy_chip_runs_child_under_cap(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "_tpu_alive", lambda timeout_s=240.0: True)
    calls = []

    def fake_run(cmd, env=None, timeout=None):
        calls.append((cmd, env.get("DESMO_BENCH_CHILD"), timeout))
        return types.SimpleNamespace(returncode=0)

    with mock.patch("subprocess.run", fake_run):
        with pytest.raises(SystemExit) as exc:
            bench_mod._watchdog()
    assert exc.value.code == 0
    (cmd, child_flag, cap), = calls
    assert child_flag == "1" and cap == 3600
    assert cmd[1].endswith("bench.py")
    assert capsys.readouterr().out == ""  # the child prints the JSON line


def test_mid_run_hang_degrades(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "_tpu_alive", lambda timeout_s=240.0: True)

    def hang_run(cmd, env=None, timeout=None):
        raise subprocess.TimeoutExpired(cmd, timeout)

    with mock.patch("subprocess.run", hang_run):
        with pytest.raises(SystemExit) as exc:
            bench_mod._watchdog()
    assert exc.value.code == 1
    line = json.loads(capsys.readouterr().out.strip())
    assert line["metric"] == bench_mod.METRIC_HEADLINE
    assert line["value"] is None
    assert "timed out" in line["error"]


def test_transient_child_failure_retries_once(bench_mod, monkeypatch, capsys):
    monkeypatch.setattr(bench_mod, "_tpu_alive", lambda timeout_s=240.0: True)
    rcs = iter([7, 0])

    def flaky_run(cmd, env=None, timeout=None):
        return types.SimpleNamespace(returncode=next(rcs))

    with mock.patch("subprocess.run", flaky_run):
        with pytest.raises(SystemExit) as exc:
            bench_mod._watchdog()
    assert exc.value.code == 0
    assert capsys.readouterr().out == ""


def test_probe_honors_forced_platform(bench_mod, monkeypatch):
    """`python -m desmo_tpu bench --platform cpu` exports
    DESMO_BENCH_PLATFORM; the liveness probe subprocess must apply it and
    assert THAT backend instead of requiring the real TPU (previously the
    flags never reached the watchdog's children and the probe spent ~29 min
    failing)."""
    monkeypatch.setenv("DESMO_BENCH_PLATFORM", "cpu")
    assert bench_mod._tpu_alive(timeout_s=240.0)


def test_compact_line_carries_headline_and_ensemble(bench_mod):
    """Round-4 regression: the driver stores only a 2000-char stdout TAIL and
    the cylinder headline (first field of one long JSON line) fell off it.
    The compact line printed last must carry headline + per-preset medians +
    ensemble ratios in <1 KB, and parse as the standard metric record."""
    out = {
        "metric": bench_mod.METRIC_HEADLINE,
        "value": 14544.0,
        "unit": "steps/s",
        "vs_baseline": 519.4,
        "presets": {
            "aneurysm": {"value": 2417.0, "vs_baseline": 690.6, "mfu": {}},
            "fourier_cylinder": {"value": 14709.0, "vs_baseline": 817.2},
        },
        "ensemble": {
            "metric": "aneurysm seed-packed ...",
            "value": 9506.0,
            "cost_vs_single_x": 1.017,
            "seed_throughput_vs_sequential_x": 3.93,
            "spread": {"n_seeds": 4, "median": 2376.5, "iqr": [1, 2], "n": 5},
        },
        "ensemble_fourier": {"error": "RuntimeError('compile failed')"},
    }
    line = bench_mod._compact_line(out)
    assert len(line) < 1024
    c = json.loads(line)
    assert c["metric"] == bench_mod.METRIC_HEADLINE
    assert c["value"] == 14544.0 and c["vs_baseline"] == 519.4
    assert c["presets"]["aneurysm"] == [2417.0, 690.6]
    assert c["ensemble"] == {
        "n_seeds": 4, "cost_vs_single_x": 1.017, "seed_throughput_x": 3.93,
    }
    # a failed extra stays VISIBLE in the tail, not silently absent
    assert "compile failed" in c["ensemble_fourier"]


def test_compact_line_real_full_sizes_fit_tail(bench_mod):
    """With all 6 presets + both ensemble entries the compact line must stay
    well under the 2000-char tail window."""
    presets = {
        n: {"value": 12345.67, "vs_baseline": 8765.43}
        for n in bench_mod.BASELINES
    }
    out = {
        "metric": bench_mod.METRIC_HEADLINE,
        "value": 15000.12,
        "unit": "steps/s",
        "vs_baseline": 535.72,
        "presets": presets,
        "ensemble": {
            "cost_vs_single_x": 1.017,
            "seed_throughput_vs_sequential_x": 3.93,
            "spread": {"n_seeds": 4},
        },
        "ensemble_fourier": {
            "cost_vs_single_x": 1.031,
            "seed_throughput_vs_sequential_x": 7.76,
            "spread": {"n_seeds": 8},
        },
    }
    assert len(bench_mod._compact_line(out)) < 1024


def test_ensemble_entry_failures_are_visible(bench_mod, monkeypatch, capsys):
    """bench.py:181-186 (round 4) swallowed ensemble failures into an absent
    key; now an exception → {"error": repr} and a policy decline →
    {"skipped": reason}, both present in the output dict."""
    monkeypatch.setattr(
        bench_mod, "bench_preset",
        lambda preset, steps, reps: {"median": 100.0, "iqr": [1, 2], "n": reps},
    )
    calls = iter([
        RuntimeError("mosaic http 500"),
        {"skipped": "select_ensemble_chunk declined"},
    ])

    def fake_ens(preset, steps, reps):
        item = next(calls)
        if isinstance(item, Exception):
            raise item
        return item

    monkeypatch.setattr(bench_mod, "bench_ensemble", fake_ens)
    bench_mod.main()
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 2
    full = json.loads(lines[0])
    assert full["ensemble"] == {"error": "RuntimeError('mosaic http 500')"}
    assert full["ensemble_fourier"]["skipped"].startswith("select_")
    compact = json.loads(lines[1])
    assert "mosaic http 500" in compact["ensemble"]


def test_cmd_bench_exports_platform_env_and_abs_path(monkeypatch, tmp_path):
    """The CLI bench entry resolves bench.py absolutely (works from any cwd)
    and exports the platform override for the watchdog's subprocesses."""
    import types as _types

    from desmo_tpu import __main__ as cli

    seen = {}
    monkeypatch.setattr(
        "runpy.run_path",
        lambda path, run_name=None: seen.update(path=path, run_name=run_name),
    )
    monkeypatch.chdir(tmp_path)  # NOT the repo root
    monkeypatch.delenv("DESMO_BENCH_PLATFORM", raising=False)
    args = _types.SimpleNamespace(platform="cpu", cpu_devices=4)
    assert cli.cmd_bench(args) == 0
    assert os.path.isabs(seen["path"]) and os.path.exists(seen["path"])
    assert os.environ["DESMO_BENCH_PLATFORM"] == "cpu"
    assert os.environ["DESMO_BENCH_CPU_DEVICES"] == "4"
