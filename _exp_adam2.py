import time, json
import jax, jax.numpy as jnp, optax
from dladmm_tpu.data.synthetic import make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params

m, n, K = 1000, 2000, 20
A = make_dictionary(jax.random.PRNGKey(0), m, n)
params = init_dladmm_params(A, K=K)
opt = optax.adam(1e-3)

def bench(step, st0, iters=8):
    @jax.jit
    def run(st):
        st = jax.lax.fori_loop(0, iters, lambda _, s: step(s), st)
        return jnp.sum(st[0].beta)
    float(run(st0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(st0)); best = min(best, time.perf_counter()-t0)
    return best / iters * 1e3

# optax adam
def step_optax(st):
    p, o = st
    g = jax.tree.map(lambda v: v * 1e-9, p)
    u, o = opt.update(g, o, p)
    return (optax.apply_updates(p, u), o)

# fused adam: one pass per leaf
def fused_init(p):
    return (jax.tree.map(jnp.zeros_like, p), jax.tree.map(jnp.zeros_like, p),
            jnp.zeros((), jnp.int32))

def step_fused(st):
    p, (mu, nu, t) = st
    g = jax.tree.map(lambda v: v * 1e-9, p)
    t = t + 1
    tf = t.astype(jnp.float32)
    b1, b2, lr, eps = 0.9, 0.999, 1e-3, 1e-8
    c1 = 1.0 / (1.0 - b1 ** tf)
    c2 = 1.0 / (1.0 - b2 ** tf)
    def upd(p, g, mu, nu):
        mu2 = b1 * mu + (1 - b1) * g
        nu2 = b2 * nu + (1 - b2) * g * g
        p2 = p - lr * (mu2 * c1) / (jnp.sqrt(nu2 * c2) + eps)
        return p2, mu2, nu2
    out = [upd(pl, gl, ml, nl) for pl, gl, ml, nl in zip(
        jax.tree.leaves(p), jax.tree.leaves(g), jax.tree.leaves(mu), jax.tree.leaves(nu))]
    td = jax.tree.structure(p)
    p2 = jax.tree.unflatten(td, [o[0] for o in out])
    mu2 = jax.tree.unflatten(td, [o[1] for o in out])
    nu2 = jax.tree.unflatten(td, [o[2] for o in out])
    return (p2, (mu2, nu2, t))

res = {}
res["optax_adam"] = bench(step_optax, (params, opt.init(params)))
res["fused_adam"] = bench(step_fused, (params, fused_init(params)))
print(json.dumps({k: round(v,2) for k,v in res.items()}))
