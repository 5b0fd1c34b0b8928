import time, json
import jax, jax.flatten_util, jax.numpy as jnp, optax
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.ops.unroll_vjp import dladmm_unroll_manual

bf = jnp.bfloat16
m, n, K, S = 1000, 2000, 20, 1024
key = jax.random.PRNGKey(0)
kA, kb = jax.random.split(key)
A = make_dictionary(kA, m, n)
params = init_dladmm_params(A, K=K)
data = make_batch(kb, A, S)
Ab, bb = A.astype(bf), data.b.astype(bf)
xs32, es32 = data.x_star, data.e_star
opt = optax.adam(1e-3)

def cal(step, carry0, hi=32):
    lo = hi // 4
    def run_n(iters):
        @jax.jit
        def run(c):
            c = jax.lax.fori_loop(0, iters, lambda _, s: step(s), c)
            return jnp.sum(jax.flatten_util.ravel_pytree(c)[0][:8].astype(jnp.float32))
        float(run(carry0))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); float(run(carry0))
            best = min(best, time.perf_counter()-t0)
        return best
    return (run_n(hi) - run_n(lo)) / (hi - lo) * 1e3

# current: cast params each step
def step_cast(st):
    p, o = st
    def loss(p):
        c = lambda t: jax.tree.map(lambda v: v.astype(bf), t)
        x, z, _ = dladmm_unroll_manual(c(p), Ab, bb)
        return (jnp.mean((x.astype(jnp.float32) - xs32) ** 2)
                + jnp.mean((z.astype(jnp.float32) - es32) ** 2))
    g = jax.grad(loss)(p)
    u, o2 = opt.update(g, o, p)
    return (optax.apply_updates(p, u), o2)

# dual-copy: loss on persistent bf16 params; Adam on fp32 master; emit both
def step_dual(st):
    p32, p16, o = st
    def loss(p16):
        x, z, _ = dladmm_unroll_manual(p16, Ab, bb)
        return (jnp.mean((x.astype(jnp.float32) - xs32) ** 2)
                + jnp.mean((z.astype(jnp.float32) - es32) ** 2))
    g16 = jax.grad(loss)(p16)
    g = jax.tree.map(lambda v: v.astype(jnp.float32), g16)
    u, o2 = opt.update(g, o, p32)
    p32n = optax.apply_updates(p32, u)
    p16n = jax.tree.map(lambda v: v.astype(bf), p32n)
    return (p32n, p16n, o2)

def step_dual2(st):
    p32, p16, o = st
    def loss(p16):
        x, z, _ = dladmm_unroll_manual(p16, Ab, bb)
        return (jnp.mean((x.astype(jnp.float32) - xs32) ** 2)
                + jnp.mean((z.astype(jnp.float32) - es32) ** 2))
    g16 = jax.grad(loss)(p16)
    u, o2 = opt.update(g16, o, p32)   # optax promotes per-op; no fp32 copy
    p32n = optax.apply_updates(p32, u)
    p16n = jax.tree.map(lambda v: v.astype(bf), p32n)
    return (p32n, p16n, o2)

res = {}
res["cast_each_step"] = cal(step_cast, (params, opt.init(params)))
p16 = jax.tree.map(lambda v: v.astype(bf), params)
res["dual_copy"] = cal(step_dual, (params, p16, opt.init(params)))
try:
    res["dual_copy_g16"] = cal(step_dual2, (params, p16, opt.init(params)))
except Exception as e:
    res["dual_copy_g16"] = str(e)[:120]
print(json.dumps({k: round(v,2) for k,v in res.items()}))
