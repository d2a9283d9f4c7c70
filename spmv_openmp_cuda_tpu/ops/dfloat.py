"""Double-float (float-float) arithmetic on the f32 VPU.

The reference computes in IEEE double throughout (reference
src/include/macros.h:63-76, config.h:113).  This TPU has no fast f64
datapath: XLA's software-emulated f64 runs the gather-shaped engines at
~0.1 GFLOP/s (BENCH_DETAILS_F64.json, round 2 pre-df).  The TPU-native
answer is classic *double-float* arithmetic (Dekker 1971; Knuth TAOCP v2
two-sum): every f64 operand is carried as an (hi, lo) pair of f32s with
hi = f32(a), lo = f32(a - hi) — 48 mantissa bits — and the SpMV inner
loops run error-compensated on the f32 vector units:

- products via Veltkamp splitting (no FMA on the VPU): exact
  TwoProduct of the hi words + the two cross terms, error O(2^-48)
  relative per product;
- accumulation via branch-free Knuth TwoSum into an (acc_hi, acc_lo)
  pair: per-add rounding is captured exactly into the low word.

Total error after K accumulations is O(K * 2^-47) relative — measured
~1e-12 relative on dense O(1) inputs where plain f32 engines sit at
~1e-6 (tests/test_dfloat.py) — vs f64's 2^-52.  All primitives are plain
jnp elementwise ops, Mosaic-lowerable inside Pallas kernels and
identical under CPU interpret mode.

These helpers are TRACE-level (no custom_jvp etc.); XLA does not apply
unsafe FP reassociation, so the error-extraction identities survive
compilation.
"""
from __future__ import annotations

from contextlib import nullcontext

import jax.numpy as jnp
import numpy as np


def x32_trace_scope():
    """32-bit canonicalization scope for tracing Pallas engine pipelines.

    The double-float suite runs with ``jax_enable_x64`` on (the
    reference's native dtype is double, macros.h:63-76), but Mosaic is
    32-bit only: under x64 any *strong* numpy int64 plan scalar that
    meets a traced value inside a kernel promotes it to int64, and the
    TPU compiler rejects the program ("64-bit types are not supported").
    Engine bodies trace inside this scope — new arrays canonicalize to
    32 bits exactly as with x64 off — while the f64 split/combine steps
    stay outside it.  A no-op when x64 is already off.
    """
    try:  # public API first (top-level re-export of the config State)
        import jax

        return jax.enable_x64(False)
    except Exception:
        pass
    try:
        from jax._src.config import enable_x64

        return enable_x64(False)
    except Exception:  # pragma: no cover - future jax refactors
        import warnings

        warnings.warn(
            "x32_trace_scope: no enable_x64 context found in this jax; "
            "Pallas engine traces are NOT protected from ambient "
            "jax_enable_x64 (expect Mosaic '64-bit types' failures under "
            "the f64 suite)",
            RuntimeWarning,
            stacklevel=2,
        )
        return nullcontext()


def traced_x32(fn):
    """Decorator: trace ``fn`` under x32_trace_scope.

    For engines whose inputs, outputs and internals are all 32-bit (the
    f32/bf16 Pallas paths) — makes them immune to an ambient
    jax_enable_x64 (e.g. a CLI session that ran a float64 mode first;
    the flag is process-global and sticky)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with x32_trace_scope():
            return fn(*args, **kwargs)

    return wrapped

#: Veltkamp split constant for f32 (2^12 + 1): splits a 24-bit mantissa
#: into two 12-bit halves whose pairwise products are exact in f32.
_SPLIT = np.float32(4097.0)


def split_f64(a: np.ndarray):
    """Host-side split of an f64 array into the (hi, lo) f32 pair."""
    a = np.asarray(a, np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def split_f64_jnp(a):
    """Trace-level split of an f64 array into the (hi, lo) f32 pair."""
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return hi, lo


def _nofma(p):
    """Pin a product's rounding before it feeds a TwoSum.

    XLA:CPU's LLVM backend may contract ``a*b`` into the following add as
    an FMA (observed to depend on the fusion's block shape): the sum then
    absorbs the UNROUNDED product while the TwoSum/TwoProduct error terms
    were extracted for the rounded one, collapsing the pair to f32
    accuracy (caught at DIA nblocks=2, bs=16: 5.6e-8 vs 2e-14 rel).
    Fence = ``copysign(|p|, p)``: an exact value-identity (incl. -0 and
    NaN) built from sign-bit ops that XLA's simplifier does not fold and
    LLVM cannot contract a mul through.  Verified on the minimal grid>=2
    Pallas repro (scripts/probe_fma_min_kernel.py): the broken hi word
    is exactly fma(a, b, p_other), and ``optimization_barrier``,
    bitcast-pairs and ``-(-p)`` are ALL folded away (mismatches remain),
    while this fence restores bit-exactness.  ``lax.reduce_precision(p,
    8, 23)`` is NOT usable either: on XLA:CPU it is not a value-identity
    (scripts/probe_fma_fence.py: hi-word bit-flips, 6.6e-7 chain error —
    worse than no fence).  The TPU VPU has no FMA and Mosaic does not
    contract, so the fence is needed exactly when the Pallas kernels run
    in interpret mode — the SAME predicate spmv_pallas uses (one source
    of truth: interpret_mode below), so the fence follows the kernels'
    actual compilation target."""
    if interpret_mode():
        return jnp.copysign(jnp.abs(p), p)
    return p


def interpret_mode() -> bool:
    """True when Pallas kernels run in interpret mode (no TPU default
    backend). Shared by the df FMA fence and every pallas_call site so the
    two decisions can never diverge."""
    import jax

    return jax.default_backend() != "tpu"


def two_sum(a, b):
    """Branch-free Knuth TwoSum: s + e == a + b exactly, s = fl(a + b)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def _veltkamp(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Dekker TwoProduct without FMA: p + e == a * b exactly in f32."""
    p = _nofma(a * b)
    ah, al = _veltkamp(a)
    bh, bl = _veltkamp(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def df_mul_acc(acc_hi, acc_lo, a_hi, a_lo, b_hi, b_lo):
    """acc += a * b where every operand is an (hi, lo) f32 pair.

    The hi-hi product is exact (TwoProduct); the cross terms a_hi*b_lo +
    a_lo*b_hi are plain f32 (their own rounding is O(2^-48) relative to
    the product); a_lo*b_lo is below the representable pair and dropped.
    The product's hi word enters acc_hi through TwoSum; everything else
    accumulates in the low word. ~28 VPU flops per element."""
    p, e = two_prod(a_hi, b_hi)
    e = e + (a_hi * b_lo + a_lo * b_hi)
    acc_hi, err = two_sum(acc_hi, p)
    return acc_hi, acc_lo + (err + e)


def df_combine64(hi, lo):
    """(hi, lo) pair -> f64 (one elementwise pass; the only f64 math)."""
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)
