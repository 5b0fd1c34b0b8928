"""End-to-end tour of the framework's user surface in one script:
generate data -> train -> evaluate vs classical LADMM -> checkpoint ->
resume -> serve. Runs in ~a minute on CPU at toy shapes; scale the
config constants up on a TPU.

    python examples/quickstart.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dladmm_tpu.utils.platform import apply_platform_env

apply_platform_env()  # DLADMM_PLATFORM=cpu runs this off-TPU

import jax
import jax.numpy as jnp

from dladmm_tpu.data.synthetic import make_batch, make_dictionary
from dladmm_tpu.serve import InferenceServer
from dladmm_tpu.train.loop import fit
from dladmm_tpu.utils.config import Config, ProblemConfig, TrainConfig


def main():
    cfg = Config(
        name="quickstart",
        problem=ProblemConfig(m=64, n=128, K=8),
        train=TrainConfig(
            batch=32,
            steps=300,
            lr=1e-3,
            lr_schedule="cosine",
            clip_norm=1.0,
            eval_every=100,
            eval_batch=128,
            layer_loss="uniform",  # deep supervision (measured best)
        ),
    )

    # 1) Train (checkpointing at every eval). The dictionary A is DATA,
    #    not a parameter — build it explicitly and pass it in (fit would
    #    otherwise generate one from the config seed).
    A = make_dictionary(jax.random.PRNGKey(42), 64, 128)
    ckpt = tempfile.mkdtemp(prefix="dladmm_quickstart_")
    params, history = fit(cfg, A=A, ckpt_dir=ckpt)
    last = history[-1]
    print(f"trained: NMSE {last['nmse_db']:.2f} dB, "
          f"residual {last['residual']:.3f}")

    # 2) The paper's signature comparison: per-layer NMSE vs classical
    #    LADMM at the same iteration count (the untrained LADMM-init
    #    net IS classical LADMM).
    curves = last["curves"]
    print(f"{'layer':>5} {'D-LADMM':>9} {'LADMM':>9}")
    for k, (a, b) in enumerate(
        zip(curves["nmse_curve_db"], curves["ladmm_curve_db"]), 1
    ):
        print(f"{k:>5} {float(a):>9.2f} {float(b):>9.2f}")

    # 3) Resume is bit-exact (deterministic per-step keys).
    params2, _ = fit(cfg, A=A, ckpt_dir=ckpt, resume=True)
    assert all(
        bool(jnp.array_equal(a, b)) for a, b in zip(params, params2)
    ), "resume mismatch"
    print("checkpoint/resume: bit-exact")

    # 4) Serve: AOT-compiled bucketed inference; layers=k is the
    #    early-exit latency knob (see the table above for what each
    #    layer buys).
    key = jax.random.PRNGKey(123)
    req = make_batch(key, A, 10)
    server = InferenceServer(params, A, max_batch=64)
    x, e = server.solve(req.b)
    fast = InferenceServer(params, A, max_batch=64, layers=4)
    x4, _ = fast.solve(req.b)
    from dladmm_tpu.metrics.core import nmse_db

    print(
        f"served {x.shape[0]} solves: NMSE full-K "
        f"{float(nmse_db(x, req.x_star)):.2f} dB, early-exit k=4 "
        f"{float(nmse_db(x4, req.x_star)):.2f} dB"
    )


if __name__ == "__main__":
    main()
