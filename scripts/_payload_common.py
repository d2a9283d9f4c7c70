"""Shared helpers for on-TPU queue payload scripts (run via
scripts/tpu_claim_run.py). One copy of the env-scoped in-process bench
runner so a fix to the save/restore logic lands everywhere at once."""
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def banner(name):
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)


def bench_inproc(out_root, subdir, **env):
    """Run bench.py's single-process path with a scoped env, writing the
    detail record into out_root/subdir so committed records are never
    touched."""
    d = os.path.join(out_root, subdir)
    os.makedirs(d, exist_ok=True)
    base = {"BENCH_INPROC": "1", "BENCH_DETAILS_DIR": d}
    saved = {}
    for k, v in {**base, **env}.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        runpy.run_path(os.path.join(REPO, "bench.py"), run_name="__main__")
    except SystemExit:
        pass
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def run_stages(stages, registry):
    """Run the selected stage functions, continuing past failures."""
    for name in stages:
        fn = registry.get(name)
        if fn is None:
            print(f"[payload] unknown stage {name!r}, skipping", flush=True)
            continue
        banner(name)
        t0 = time.time()
        try:
            fn()
        except Exception as e:  # keep the queue draining
            print(f"[payload] stage {name} FAILED: {e!r}", flush=True)
        print(f"[payload] stage {name} done in {time.time() - t0:.0f}s",
              flush=True)
