import time, json
import jax, jax.flatten_util, jax.numpy as jnp
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params, dladmm_forward
from dladmm_tpu.ops.pallas_unroll import make_unrolled_forward

def cal(step, carry0, hi=128):
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
key = jax.random.PRNGKey(0)
kA, kb = jax.random.split(key)
for (m2, n2, K2, S2) in [(250, 500, 15, 64), (250, 500, 15, 1024)]:
    A2 = make_dictionary(kA, m2, n2)
    p2 = init_dladmm_params(A2, K=K2)
    d2 = make_batch(kb, A2, S2)
    def fs(fwd):
        def step(b):
            x, z, lam = fwd(p2, A2, b)
            return d2.b + 1e-12 * lam
        return step
    res[f"ref{S2}_fwd_xla_us"] = round(cal(fs(lambda p,A_,b: dladmm_forward(p,A_,b)), d2.b)*1e3, 1)
    mk = make_unrolled_forward()
    res[f"ref{S2}_fwd_megakernel_us"] = round(cal(fs(mk), d2.b)*1e3, 1)
print(json.dumps(res))
