import time, json
import jax, jax.flatten_util, jax.numpy as jnp, optax
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params, dladmm_forward
from dladmm_tpu.ops.pallas_unroll import make_unrolled_forward
from dladmm_tpu.ops.unroll_vjp import dladmm_unroll_manual

def cal(step, carry0, hi=256):
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
for (m2, n2, K2, S2, hi) in [(250, 500, 15, 64, 512), (250, 500, 15, 1024, 128)]:
    A2 = make_dictionary(kA, m2, n2)
    p2 = init_dladmm_params(A2, K=K2)
    d2 = make_batch(kb, A2, S2)
    opt = optax.adam(1e-3)
    def mk(fwd):
        def step(st):
            p, o = st
            def loss(p):
                x, z, _ = fwd(p, A2, d2.b)
                return jnp.mean((x - d2.x_star) ** 2) + jnp.mean((z - d2.e_star) ** 2)
            g = jax.grad(loss)(p)
            u, o2 = opt.update(g, o, p)
            return (optax.apply_updates(p, u), o2)
        return step
    st0 = (p2, opt.init(p2))
    mega = make_unrolled_forward()
    res[f"S{S2}_train_xla_auto_us"] = round(cal(mk(lambda p,A_,b: dladmm_forward(p,A_,b)), st0, hi)*1e3,1)
    res[f"S{S2}_train_manual_us"] = round(cal(mk(dladmm_unroll_manual), st0, hi)*1e3,1)
    res[f"S{S2}_train_mega_manual_us"] = round(cal(mk(mega), st0, hi)*1e3,1)
print(json.dumps(res))
