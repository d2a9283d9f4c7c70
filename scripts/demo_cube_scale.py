import time
import numpy as np, jax, jax.numpy as jnp
import spmv_openmp_cuda_tpu  # noqa
from spmv_openmp_cuda_tpu.formats.dia import DeviceDIA
from spmv_openmp_cuda_tpu.ops.spmv_pallas import plan_dia, pad_dia_for_pallas, dia_spmv_pallas

z = np.load("/tmp/cube_arrays.npz")
mat0 = DeviceDIA(
    data=jnp.asarray(z["data"]).view(jnp.bfloat16) if z["data"].dtype.itemsize == 2 else jnp.asarray(z["data"]),
    offsets=tuple(int(o) for o in z["offsets"]),
    shape=(int(z["m"]), int(z["n"])),
    nnz=int(z["nnz"]),
    pad_sub=int(z["pad_sub"]),
)
plan = plan_dia(mat0)
mat = pad_dia_for_pallas(mat0, plan)
x = jnp.asarray(z["x"])
nnz = int(z["nnz"])
t0 = time.perf_counter()
y = np.asarray(dia_spmv_pallas(mat, x, plan), np.float64)
print(f"first run+compile {time.perf_counter()-t0:.0f}s", flush=True)
print(f"check maxdiff={np.abs(y - z['oracle']).max():.2e}", flush=True)

def slope(f, carry, LO=16, HI=104, K=8):
    @jax.jit
    def ch(c, iters):
        def body(i, c):
            for _ in range(K):
                yv = f(c)
                c = c * (1.0 + jnp.sum(yv) * 1e-30)
            return c
        return jax.lax.fori_loop(0, iters, body, c, unroll=False)
    ts = {}
    for steps in (LO, HI):
        s_ = jnp.int32(-(-steps // K))
        _ = float(jnp.sum(ch(carry, s_)))
        best = 1e9
        for _ in range(2):
            t1 = time.perf_counter()
            _ = float(jnp.sum(ch(carry, s_)))
            best = min(best, time.perf_counter()-t1)
        ts[steps] = best
    return (ts[HI]-ts[LO])/((-(-HI//K) - -(-LO//K))*K)

ps = slope(lambda c: dia_spmv_pallas(mat, c, plan), x)
print(f"RESULT cube_coup-scale (127M nnz): {ps*1e6:8.1f} us/step -> {2*nnz/ps/1e9:6.1f} GFLOPS (reference OMP 40-thread: 4.3)", flush=True)
