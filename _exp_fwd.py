import time, json
import jax, jax.numpy as jnp
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params, dladmm_forward
from dladmm_tpu.ops.unroll_vjp import dladmm_unroll_manual

m, n, K, S = 1000, 2000, 20, 1024
key = jax.random.PRNGKey(0)
kA, kb = jax.random.split(key)
A = make_dictionary(kA, m, n)
params = init_dladmm_params(A, K=K)
data = make_batch(kb, A, S)
bf = jnp.bfloat16
c = lambda t: jax.tree.map(lambda v: v.astype(bf), t)
pb, Ab, bb = c(params), c(A), c(data.b)

def chained_b(fn, p, A_, b0, iters=16):
    """Chain via the b input: b_{i+1} = b0 + eps*lam_i — true serialization."""
    @jax.jit
    def run(b):
        def body(_, b):
            out = fn(b)
            return b0 + 1e-12 * out
        return jnp.sum(jax.lax.fori_loop(0, iters, body, b))
    float(run(b0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(b0)); best = min(best, time.perf_counter()-t0)
    return best / iters * 1e3

def fwd_fn(p, A_):
    def f(b):
        x, z, lam = dladmm_forward(p, A_, b)
        return lam
    return f

def grad_fn(p, A_):
    def f(b):
        def loss(p):
            x, z, _ = dladmm_unroll_manual(p, A_, b)
            return jnp.mean(x.astype(jnp.float32) ** 2) + jnp.mean(z.astype(jnp.float32) ** 2)
        g = jax.grad(loss)(p)
        # consume EVERY grad leaf so nothing DCEs
        s = sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(g))
        return jnp.broadcast_to(s.astype(b.dtype) * 1e-9, b.shape)
    return f

res = {}
res["fwd_fp32"] = chained_b(fwd_fn(params, A), params, A, data.b)
res["fwd_bf16"] = chained_b(fwd_fn(pb, Ab), pb, Ab, bb)
res["fwd_grad_full_fp32"] = chained_b(grad_fn(params, A), params, A, data.b)
res["fwd_grad_full_bf16"] = chained_b(grad_fn(pb, Ab), pb, Ab, bb)
print(json.dumps({k: round(v,2) for k,v in res.items()}, indent=1))
