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
    for suite in (bench.SUITE, bench.F64_SUITE, bench.EXT_SUITE):
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
    for preset, _ref, candidates in bench.F64_SUITE:
        for name in candidates:
            spec = registry.get(name)
            assert spec.impl != "pallas" or spec.f64, (
                f"{name} is a 32-bit Pallas mode in the f64 suite"
            )
