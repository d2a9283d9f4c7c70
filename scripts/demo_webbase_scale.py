import time
import numpy as np, jax, jax.numpy as jnp
import spmv_openmp_cuda_tpu as S  # run from /root/repo or PYTHONPATH=/root/repo:/root/.axon_site
from spmv_openmp_cuda_tpu.formats.routed import prepare_routed_auto, routed_auto_spmv, RoutedChunks
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.utils import synth

t0 = time.perf_counter()
coo = synth.preset("webbase_like", seed=0)
csr = S.coo_to_csr(coo)
print(f"gen {time.perf_counter()-t0:.0f}s nnz={csr.nnz} maxrow={csr.max_row_nz}", flush=True)
t0 = time.perf_counter()
mat = prepare_routed_auto(csr)
kind = f"chunks={len(mat.chunks)}" if isinstance(mat, RoutedChunks) else "single"
print(f"prep {time.perf_counter()-t0:.0f}s {kind}", flush=True)
x = fill_rnd_vector(csr.shape[1], seed=1)
xj = jnp.asarray(x, jnp.float32)
f = jax.jit(routed_auto_spmv)
t0 = time.perf_counter()
y = np.asarray(f(mat, xj), np.float64)
print(f"compile+run {time.perf_counter()-t0:.0f}s", flush=True)
d = np.abs(y - serial_csr_spmv(csr, x)).max()
print(f"check maxdiff={d:.2e}", flush=True)

def slope(LO=16, HI=200, K=8):
    @jax.jit
    def ch(c, iters):
        def body(i, c):
            for _ in range(K):
                yv = routed_auto_spmv(mat, c)
                c = c * (1.0 + jnp.sum(yv) * 1e-30)
            return c
        return jax.lax.fori_loop(0, iters, body, c, unroll=False)
    ts = {}
    for steps in (LO, HI):
        s_ = jnp.int32(-(-steps // K))
        _ = float(jnp.sum(ch(xj, s_)))
        best = 1e9
        for _ in range(2):
            t1 = time.perf_counter()
            _ = float(jnp.sum(ch(xj, s_)))
            best = min(best, time.perf_counter()-t1)
        ts[steps] = best
    return (ts[HI]-ts[LO])/((-(-HI//K) - -(-LO//K))*K)

ps = slope()
print(f"RESULT webbase-scale: {ps*1e6:8.1f} us/step -> {2*csr.nnz/ps/1e9:6.2f} GFLOPS (reference OMP best: 2.75e-3 s = {2*csr.nnz/2.75e-3/1e9:.2f} GF-equiv)", flush=True)
