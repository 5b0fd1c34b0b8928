import time, json
import jax, jax.numpy as jnp, optax
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.ops.unroll_vjp import dladmm_unroll_manual
from dladmm_tpu.train.loop import TrainState, loss_fn

m, n, K, S = 1000, 2000, 20, 1024
key = jax.random.PRNGKey(0)
kA, kb = jax.random.split(key)
A = make_dictionary(kA, m, n)
params = init_dladmm_params(A, K=K)
data = make_batch(kb, A, S)
opt = optax.adam(1e-3)
st0 = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

def bench(step, st0, iters=8):
    @jax.jit
    def run(st):
        st = jax.lax.fori_loop(0, iters, lambda _, s: step(s), st)
        return jnp.sum(st.params.beta)
    float(run(st0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); float(run(st0)); best = min(best, time.perf_counter()-t0)
    return best / iters * 1e3

def wrapped(p, cd):
    with jax.default_matmul_precision("bfloat16"):
        return loss_fn(p, A, data.b, data.x_star, data.e_star,
                       compute_dtype=cd, vjp="manual")

def step_full(cd):
    def step(st):
        l, g = jax.value_and_grad(lambda p: wrapped(p, cd))(st.params)
        u, o = opt.update(g, st.opt_state, st.params)
        return TrainState(optax.apply_updates(st.params, u), o, st.step+1)
    return step

def step_nograd_adam(st):
    # fake grads = params*1e-9 (no backward); isolates optimizer cost
    g = jax.tree.map(lambda v: v * 1e-9, st.params)
    u, o = opt.update(g, st.opt_state, st.params)
    return TrainState(optax.apply_updates(st.params, u), o, st.step+1)

def step_grad_sgd(cd):
    def step(st):
        l, g = jax.value_and_grad(lambda p: wrapped(p, cd))(st.params)
        p2 = jax.tree.map(lambda p, gg: p - 1e-3*gg, st.params, g)
        return TrainState(p2, st.opt_state, st.step+1)
    return step

res = {}
res["full_bf16"] = bench(step_full(jnp.bfloat16), st0)
res["adam_only"] = bench(step_nograd_adam, st0)
res["grad_sgd_bf16"] = bench(step_grad_sgd(jnp.bfloat16), st0)
print(json.dumps({k: round(v,2) for k,v in res.items()}, indent=1))
