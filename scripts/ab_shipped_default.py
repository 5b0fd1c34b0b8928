"""One-off (round 5): measure the TRUE shipped synthetic-preset step —
deep supervision (uniform trajectory loss) + the fused int8-moment
optimizer sweep — next to its fp32-optimizer and final-layer siblings,
flagship shape, one chip session."""
import json
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, optax

# Same harness hooks as scripts/ab_moments.py so the control flow can
# be smoke-tested off-TPU: DLADMM_BENCH_PLATFORM=cpu forces the backend
# (the sandbox sitecustomize pins JAX_PLATFORMS; jax.config is the only
# working override), DLADMM_BENCH_SMOKE=1 shrinks shapes to seconds.
_PLATFORM = os.environ.get("DLADMM_BENCH_PLATFORM")
_SMOKE = bool(os.environ.get("DLADMM_BENCH_SMOKE"))
if _PLATFORM:
    jax.config.update("jax_platforms", _PLATFORM)
jax.config.update("jax_compilation_cache_dir", "/tmp/dladmm_jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.models.api import select_forward
from dladmm_tpu.train.loop import _layer_weights, make_train_state, make_train_step_from_batch
from dladmm_tpu.train.qadam_pallas import QAdamFusedPallas
from dladmm_tpu.bench.timing import time_chained

m, n, K, S = (100, 200, 5, 64) if _SMOKE else (1000, 2000, 20, 1024)
key = jax.random.PRNGKey(0)
kA, kb = jax.random.split(key)
A = make_dictionary(kA, m, n)
params = init_dladmm_params(A, K=K)
data = make_batch(kb, A, S)
bf = jnp.bfloat16
fwd, step_fn, desc = select_forward(m, n, m, S, need_trajectory=True)
lw = _layer_weights("uniform", K, jnp.float32)
out = {"forward": desc}
for name, opt in [
    ("ds_int8_pallas", QAdamFusedPallas(1e-3, moment_fmt="int8")),
    ("ds_float32", optax.adam(1e-3)),
    ("ds_sr_mu_pallas", QAdamFusedPallas(1e-3, moment_fmt="bfloat16_sr_mu")),
]:
    step = make_train_step_from_batch(
        opt, A, layer_weights=lw, forward_fn=fwd, step_fn=step_fn,
        compute_dtype=bf, donate=False)
    def s(state, step=step):
        ns, _ = step(state, data)
        return ns
    t = time_chained(s, make_train_state(params, opt, bf))
    out[name + "_step_ms"] = round(t * 1e3, 3)
    print(name, out[name + "_step_ms"], flush=True)
if _SMOKE or _PLATFORM:
    out["SMOKE_MODE"] = "off-chip control-flow check — numbers meaningless"
else:
    # Only a real-chip run may write the round artifact.
    with open("bench_out/ab_shipped_default_r5.json", "w") as f:
        json.dump(out, f, indent=1)
print(json.dumps(out))
