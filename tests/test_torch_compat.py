"""Torch checkpoint migration (utils/torch_compat.py).

Covers the "switch from the reference" path: reference-style PyTorch
state dicts (SURVEY.md §3.1 Model row) import into stacked DLADMMParams,
round-trip back out, and — the load-bearing check — an independent torch
implementation of the SURVEY.md §2 recurrence produces the same forward
trajectory as models/unroll.dladmm_forward on the imported weights.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from dladmm_tpu.models.unroll import dladmm_forward, init_dladmm_params
from dladmm_tpu.utils.torch_compat import (
    from_torch,
    save_torch,
    to_torch_state_dict,
)

M, N, K, S = 24, 40, 4, 8


def _rand_params(seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(M, N)) / np.sqrt(M)
    params = init_dladmm_params(jnp.asarray(A, jnp.float32), K=K, beta=0.7)
    # Perturb so the import is not testing a symmetric special case.
    leaves = [
        np.asarray(leaf) * rng.uniform(0.8, 1.2, size=leaf.shape)
        for leaf in params
    ]
    return jnp.asarray(A, jnp.float32), type(params)(
        *(jnp.asarray(l, jnp.float32) for l in leaves)
    )


def _assert_params_equal(a, b, tol=0):
    for la, lb, name in zip(a, b, a._fields):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), atol=tol, rtol=0, err_msg=name
        )


def test_round_trip_exact():
    _, params = _rand_params()
    back = from_torch(to_torch_state_dict(params))
    _assert_params_equal(params, back)


def test_file_round_trip(tmp_path):
    _, params = _rand_params(1)
    path = tmp_path / "ref_ckpt.pt"
    save_torch(params, path)
    back = from_torch(str(path))
    _assert_params_equal(params, back)


@pytest.mark.parametrize(
    "fmt",
    [
        "{f}_{k}",  # underscore attributes: W1_0
        "layers.{k}.{f}",  # ModuleList of layer blocks
    ],
)
def test_key_layout_variants(fmt):
    _, params = _rand_params(2)
    base = to_torch_state_dict(params)
    sd = {}
    for key, v in base.items():
        f, k = key.split(".")
        sd[fmt.format(f=f, k=k)] = v
    back = from_torch(sd)
    _assert_params_equal(params, back)


def test_alias_and_ignored_keys():
    _, params = _rand_params(3)
    base = to_torch_state_dict(params)
    sd = {}
    for key, v in base.items():
        f, k = key.split(".")
        f = {"theta1": "soft_thr1", "theta2": "soft_thr2", "beta": "rho"}.get(
            f, f
        )
        sd[f"{f}.{k}"] = v
    sd["A"] = torch.zeros(M, N)  # dictionary buffer: ignored with a warning
    with pytest.warns(UserWarning, match="ignored 1 non-parameter"):
        back = from_torch(sd)
    _assert_params_equal(params, back)


def test_transposed_linear_orientation_fixed():
    A, params = _rand_params(4)
    sd = to_torch_state_dict(params)
    for k in range(K):
        sd[f"W1.{k}"] = sd[f"W1.{k}"].T.contiguous()
        sd[f"W2.{k}"] = sd[f"W2.{k}"].T.contiguous()
    # W2 is square (B = I benchmark) so only W1 is detectable; make W2
    # symmetric so orientation is irrelevant for it.
    for k in range(K):
        w2 = sd[f"W2.{k}"]
        sd[f"W2.{k}"] = (w2 + w2.T) / 2
    with pytest.warns(UserWarning, match="W1 arrived transposed"):
        back = from_torch(sd, A=np.asarray(A))
    np.testing.assert_allclose(np.asarray(back.W1), np.asarray(params.W1))


def test_vector_beta_and_missing_beta():
    _, params = _rand_params(5)
    sd = to_torch_state_dict(params)
    betas = torch.stack([sd.pop(f"beta.{k}") for k in range(K)])
    sd["beta"] = betas
    back = from_torch(sd)
    np.testing.assert_allclose(np.asarray(back.beta), np.asarray(params.beta))

    del sd["beta"]
    with pytest.warns(UserWarning, match="no beta"):
        back = from_torch(sd, default_beta=0.7)
    np.testing.assert_allclose(np.asarray(back.beta), np.full(K, 0.7))


def test_unclassifiable_key_errors_with_rename_hint():
    _, params = _rand_params(6)
    sd = to_torch_state_dict(params)
    sd = {k.replace("W1", "mystery"): v for k, v in sd.items()}
    with pytest.raises(ValueError, match="rename="):
        from_torch(sd)
    back = from_torch(
        sd, rename={f"mystery.{k}": f"W1.{k}" for k in range(K)}
    )
    _assert_params_equal(params, back)


def _torch_forward(sd, A, b, K):
    """Independent torch implementation of the SURVEY.md §2 recurrence
    (B = I), written module-style over per-layer ParameterList entries —
    the shape of the reference's ``net.forward`` (SURVEY.md §5.1)."""
    A = torch.as_tensor(np.asarray(A), dtype=torch.float64)
    b = torch.as_tensor(np.asarray(b), dtype=torch.float64)
    S = b.shape[0]
    x = torch.zeros(S, A.shape[1], dtype=torch.float64)
    z = torch.zeros(S, A.shape[0], dtype=torch.float64)
    lam = torch.zeros_like(b)

    def shrink(u, th):
        th = torch.clamp(th, min=0.0)
        return torch.sign(u) * torch.clamp(torch.abs(u) - th, min=0.0)

    for k in range(K):
        W1 = sd[f"W1.{k}"].double()
        W2 = sd[f"W2.{k}"].double()
        th1 = sd[f"theta1.{k}"].double()
        th2 = sd[f"theta2.{k}"].double()
        beta = torch.clamp(sd[f"beta.{k}"].double(), min=1e-6)
        u = x @ A.T + z - b + lam / beta
        x = shrink(x - u @ W1.T, th1)
        v = x @ A.T + z - b + lam / beta
        z = shrink(z - v @ W2.T, th2)
        lam = lam + beta * (x @ A.T + z - b)
    return x, z, lam


def test_forward_parity_torch_vs_jax():
    A, params = _rand_params(7)
    sd = to_torch_state_dict(params)
    rng = np.random.default_rng(8)
    b = rng.normal(size=(S, M)).astype(np.float32)

    xt, zt, lt = _torch_forward(sd, A, b, K)
    xj, zj, lj = dladmm_forward(
        from_torch(sd), jnp.asarray(A), jnp.asarray(b)
    )
    np.testing.assert_allclose(np.asarray(xj), xt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(zj), zt.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lj), lt.numpy(), atol=2e-5)


@pytest.mark.slow
def test_cli_export_then_import(tmp_path, capsys):
    """run.py --export-torch / --import-torch round-trip: the warm-started
    run must start from the exported net, not the LADMM init."""
    from dladmm_tpu.run import main

    ckpt = tmp_path / "mig.pt"
    rc = main(
        ["--config=synthetic_small", "--steps=6", f"--export-torch={ckpt}"]
    )
    assert rc == 0 and ckpt.exists()
    capsys.readouterr()

    rc = main(
        ["--config=synthetic_small", "--steps=2", f"--import-torch={ckpt}"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "imported torch checkpoint" in out

    # Warm start actually took effect: the imported net (6+2 steps of
    # training) differs from what 2 steps from the LADMM init produce.
    import json

    final_warm = json.loads(
        [l for l in out.splitlines() if l.startswith("{")][-1]
    )
    rc = main(["--config=synthetic_small", "--steps=2"])
    assert rc == 0
    out_cold = capsys.readouterr().out
    final_cold = json.loads(
        [l for l in out_cold.splitlines() if l.startswith("{")][-1]
    )
    assert final_warm["final_nmse_db"] != final_cold["final_nmse_db"]


def test_cli_import_rejected_for_sharded_configs(tmp_path):
    from dladmm_tpu.run import main

    with pytest.raises(SystemExit):
        main(["--config=tp_small", "--import-torch=whatever.pt"])
    with pytest.raises(SystemExit):
        main(["--config=tp_small", "--export-torch=out.pt"])


def test_from_torch_bfloat16_checkpoint():
    """Reference checkpoints saved in bf16 import (torch bf16 tensors
    have no numpy dtype; the importer must upcast)."""
    torch = pytest.importorskip("torch")
    _, params = _rand_params(3)
    sd = {
        k: torch.as_tensor(np.asarray(v)).to(torch.bfloat16)
        for k, v in to_torch_state_dict(params).items()
    }
    back = from_torch(sd)
    for la, lb, name in zip(params, back, params._fields):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-2, atol=1e-2,
            err_msg=name,
        )


class _Box:  # module-level so torch.save can pickle it
    """Stand-in for a torch.save(net) whole-module checkpoint: not a
    tensor container, so the weights_only loader rejects it."""

    def __init__(self, sd):
        self._sd = sd

    def state_dict(self):
        return self._sd


def test_from_torch_rejects_module_pickle_without_opt_in(tmp_path):
    """Files the weights_only loader rejects must NOT fall back to a
    full unpickle silently — that would execute arbitrary pickle code.
    allow_pickle=True is the explicit opt-in."""
    torch = pytest.importorskip("torch")
    Box = _Box

    _, params = _rand_params(4)
    path = tmp_path / "whole_module.pt"
    torch.save(Box(to_torch_state_dict(params)), path)
    with pytest.raises(ValueError, match="allow_pickle"):
        from_torch(str(path))
    back = from_torch(str(path), allow_pickle=True)
    _assert_params_equal(params, back)
