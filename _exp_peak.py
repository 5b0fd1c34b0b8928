import time, json
import jax, jax.numpy as jnp

def sync_bench(make_run, iters=8):
    run = jax.jit(make_run(iters))
    float(run())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run())
        best = min(best, time.perf_counter()-t0)
    return best / iters

# matmul peak: chained 4096^3 bf16
M = 4096
a = jnp.ones((M, M), jnp.bfloat16)
def mk_mm(iters):
    def run():
        def body(_, v):
            w = jax.lax.dot_general(v, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
            return w * (1.0 / M)
        v = jax.lax.fori_loop(0, iters, body, a)
        return v[0, 0].astype(jnp.float32)
    return run

t = sync_bench(mk_mm)
tfs = 2 * M**3 / t / 1e12
# 2-D elementwise bandwidth
X = jnp.ones((8192, 8192), jnp.float32)
def mk_ew(iters):
    def run():
        v = jax.lax.fori_loop(0, iters, lambda _, v: jnp.sqrt(v * v + 1.0), X)
        return v[0, 0]
    return run
t2 = sync_bench(mk_ew)
gbps = 2 * X.size * 4 / t2 / 1e9
print(json.dumps({"mm4096_ms": round(t*1e3,3), "TFs": round(tfs,1),
                  "ew2d_ms": round(t2*1e3,3), "eff_GBps": round(gbps,1)}))
