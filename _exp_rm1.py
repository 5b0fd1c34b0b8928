import time, json
import jax, jax.flatten_util, jax.numpy as jnp
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params, dladmm_forward

def cal(step, carry0, hi=32):
    lo = hi // 4
    def run_n(iters):
        @jax.jit
        def run(c):
            c = jax.lax.fori_loop(0, iters, lambda _, s: step(s), c)
            return jnp.sum(jax.flatten_util.ravel_pytree(c)[0][:8])
        float(run(carry0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(run(carry0))
            best = min(best, time.perf_counter()-t0)
        return best
    return (run_n(hi) - run_n(lo)) / (hi - lo) * 1e3

res = {}
m, n, K, S = 1000, 2000, 20, 1024
key = jax.random.PRNGKey(0)
kA, kb = jax.random.split(key)
A = make_dictionary(kA, m, n)
params = init_dladmm_params(A, K=K)
data = make_batch(kb, A, S)

def fwd_step(fwd):
    def step(b):
        x, z, lam = fwd(params, A, b)
        return data.b + 1e-12 * lam
    return step

res["flagship_fwd_default"] = cal(fwd_step(lambda p,A_,b: dladmm_forward(p,A_,b)), data.b)
def fwd32(p, A_, b):
    with jax.default_matmul_precision("float32"):
        return dladmm_forward(p, A_, b)
res["flagship_fwd_fp32mm"] = cal(fwd_step(fwd32), data.b)
print(json.dumps({k: round(v,3) for k,v in res.items()}))
