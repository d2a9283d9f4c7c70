"""Static contract of the bench driver's suites: every suite entry names a
real synth preset and registered kernels (a typo would only surface on the
next real-TPU bench run, which may be hours away behind the pool tunnel)."""
import importlib.util
import os
import sys

from spmv_openmp_cuda_tpu.ops import registry
from spmv_openmp_cuda_tpu.utils import synth


def _bench_module():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)  # main() is not called on import
    return mod


def test_suite_entries_resolve():
    bench = _bench_module()
    modes = set(registry.names())
    for suite in (
        bench.SUITE, bench.F64_SUITE, bench.EXT_SUITE, bench.EXT_F64_SUITE
    ):
        for preset, ref_gflops, candidates in suite:
            assert preset in synth.PRESETS, preset
            assert ref_gflops > 0
            assert candidates, preset
            for name in candidates:
                assert name in modes, name
    for extra in (bench.AB_EXTRA, bench.F64_AB_EXTRA):
        for preset, candidates in extra.items():
            assert preset in synth.PRESETS, preset
            for name in candidates:
                assert name in modes, name


def test_f64_suite_uses_f64_capable_modes():
    bench = _bench_module()
    for suite in (bench.F64_SUITE, bench.EXT_F64_SUITE):
        for preset, _ref, candidates in suite:
            for name in candidates:
                spec = registry.get(name)
                assert spec.impl != "pallas" or spec.f64, (
                    f"{name} is a 32-bit Pallas mode in the f64 suite"
                )


def test_fallback_entries_resolve():
    bench = _bench_module()
    modes = set(registry.names())
    for fb in (
        bench.FALLBACK, bench.F64_FALLBACK, bench.EXT_FALLBACK,
        bench.EXT_F64_FALLBACK,
    ):
        for preset, candidates in fb.items():
            assert preset in synth.PRESETS, preset
            assert candidates, preset
            for name in candidates:
                assert name in modes, name
    # every headline proxy has a fallback ladder
    for suite, fb in (
        (bench.SUITE, bench.FALLBACK),
        (bench.F64_SUITE, bench.F64_FALLBACK),
        (bench.EXT_SUITE, bench.EXT_FALLBACK),
        (bench.EXT_F64_SUITE, bench.EXT_F64_FALLBACK),
    ):
        for preset, _ref, _c in suite:
            assert preset in fb, preset


# ---- orchestrator integration (stub worker, no TPU, no jax) ----------

import json
import subprocess


def _run_orchestrator(tmp_path, extra_env):
    repo = os.path.join(os.path.dirname(__file__), "..")
    stub = os.path.join(os.path.dirname(__file__), "stub_bench_worker.py")
    env = dict(os.environ)
    env.pop("BENCH_INPROC", None)
    env.pop("BENCH_WORKER_PLAN", None)
    env.update(
        {
            "BENCH_WORKER_CMD": f"{sys.executable} {stub}",
            # the stub's fake rows must never reach the committed record
            "BENCH_DETAILS_DIR": str(tmp_path),
            "BENCH_POLL_S": "0.1",
            "BENCH_KILL_BACKOFF_S": "0.1",
            "BENCH_PROXY_TIMEOUT_S": "1.5",
            "BENCH_RETRY_TIMEOUT_S": "1.5",
            "BENCH_CLAIM_TIMEOUT_S": "10",
            "BENCH_TOTAL_S": "60",
            "BENCH_POOL_WAIT_S": "0.2",
            "STUB_LOG": str(tmp_path / "plans.log"),
        }
    )
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=120,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout + out.stderr
    return json.loads(lines[0]), out.stderr, tmp_path / "plans.log"


def test_orchestrator_happy_path(tmp_path):
    rec, err, _log = _run_orchestrator(tmp_path, {})
    assert rec["vs_baseline"] == 2.0
    assert "proxies_measured" not in rec, (rec, err)


def test_orchestrator_stall_retry_fallback_drop(tmp_path):
    bench = _bench_module()
    stuck = bench.SUITE[0][0]
    rec, err, log = _run_orchestrator(tmp_path, {"STUB_STALL": stuck})
    # the stuck proxy was dropped after primary+retry+fallback attempts;
    # every other proxy landed
    assert rec["proxies_measured"] == len(bench.SUITE) - 1, (rec, err)
    plans = [json.loads(ln) for ln in log.read_text().splitlines()]
    assert len(plans) >= 3
    # launch 1: suite order; launch 2: stuck proxy requeued at the end
    assert plans[0][0]["preset"] == stuck
    assert plans[1][-1]["preset"] == stuck
    assert [p["preset"] for p in plans[1][:-1]] == [
        p for p, _r, _c in bench.SUITE if p != stuck
    ]
    # launch 3: fallback candidates swapped in for the stuck proxy
    assert plans[2] == [
        {
            "preset": stuck,
            "ref": bench.SUITE[0][1],
            "cands": bench.FALLBACK[stuck],
        }
    ], plans[2]


def test_orchestrator_pool_down_retries(tmp_path):
    rec, err, _log = _run_orchestrator(
        tmp_path,
        {"STUB_POOL_DOWN": "2", "BENCH_KILL_BACKOFF_S": "0.1"},
    )
    assert rec["vs_baseline"] == 2.0, (rec, err)
    assert "pool down" in err


def test_worker_env_can_import_package(tmp_path):
    """The real worker runs bench.py via runpy (python>=3.11: no script-dir
    on sys.path), so worker_env must put the repo on PYTHONPATH — round-3's
    first orchestrator run crash-looped on exactly this."""
    bench = _bench_module()
    env = bench.worker_env(str(tmp_path / "plan.json"), str(tmp_path))
    assert env["PALLAS_AXON_POOL_IPS"] == ""
    out = subprocess.run(
        [sys.executable, "-c", "import spmv_openmp_cuda_tpu; print('ok')"],
        env=env,
        cwd=str(tmp_path),  # NOT the repo: only PYTHONPATH may provide it
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr


def test_orchestrator_never_touches_repo_record(tmp_path):
    repo = os.path.join(os.path.dirname(__file__), "..")
    record = os.path.join(repo, "BENCH_DETAILS.json")
    before = open(record).read() if os.path.exists(record) else None
    _rec, _err, _log = _run_orchestrator(tmp_path, {})
    after = open(record).read() if os.path.exists(record) else None
    assert before == after, "stub run overwrote the committed record"
    assert (tmp_path / "BENCH_DETAILS.json").exists()


def test_build_suite_bench_cands_pins_candidates(monkeypatch):
    """BENCH_CANDS (round-5 A/B hook) replaces every selected proxy's
    candidate list verbatim."""
    import bench as B

    monkeypatch.setenv("BENCH_ONLY", "thermal2_like")
    monkeypatch.setenv("BENCH_CANDS", "PL_CSR_WINDOW,PL_CSR_ROUTED")
    suite, _fb, _ext, _dt, _n = B.build_suite()
    assert [s[0] for s in suite] == ["thermal2_like"]
    assert suite[0][2] == ["PL_CSR_WINDOW", "PL_CSR_ROUTED"]


def test_emit_partial_writes_dot_partial(tmp_path, monkeypatch, capsys):
    """Incomplete suites persist under a .partial name (round 5): measured
    rows survive infrastructure failures without clobbering the record."""
    import json

    import bench as B

    monkeypatch.setenv("BENCH_DETAILS_DIR", str(tmp_path))
    rows = [
        {"matrix": "a", "ratio": 2.0, "gflops": 10.0},
        {"matrix": "b", "ratio": 4.0, "gflops": 20.0},
    ]
    B.emit(rows, extended=True, dtype="float64", base_len=5)
    out = capsys.readouterr().out
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["proxies_measured"] == 2 and rec["proxies_total"] == 5
    p = tmp_path / "BENCH_DETAILS_EXTENDED_F64.json.partial"
    assert p.exists()
    assert not (tmp_path / "BENCH_DETAILS_EXTENDED_F64.json").exists()
    assert json.loads(p.read_text()) == rows
