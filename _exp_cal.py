import time, json
import jax, jax.numpy as jnp

M = 4096
a = jnp.ones((M, M), jnp.bfloat16)

def run_iters(iters):
    @jax.jit
    def run():
        def body(_, v):
            w = jax.lax.dot_general(v, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
            return w * (1.0 / M)
        v = jax.lax.fori_loop(0, iters, body, a)
        return v[0, 0].astype(jnp.float32)
    float(run())
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter(); float(run())
        best = min(best, time.perf_counter()-t0)
    return best

t8, t64 = run_iters(8), run_iters(64)
per_iter = (t64 - t8) / 56
rtt = t8 - 8 * per_iter
tfs = 2 * M**3 / per_iter / 1e12
# elementwise too
X = jnp.ones((8192, 8192), jnp.float32)
def run_ew(iters):
    @jax.jit
    def run():
        v = jax.lax.fori_loop(0, iters, lambda _, v: jnp.sqrt(v * v + 1.0), X)
        return v[0, 0]
    float(run())
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter(); float(run())
        best = min(best, time.perf_counter()-t0)
    return best
e8, e64 = run_ew(8), run_ew(64)
pe = (e64 - e8) / 56
gbps = 2 * X.size * 4 / pe / 1e9
print(json.dumps({"mm_per_iter_ms": round(per_iter*1e3,3), "TFs": round(tfs,1),
                  "rtt_ms": round(rtt*1e3,2),
                  "ew_per_iter_ms": round(pe*1e3,3), "eff_GBps": round(gbps,1)}))
