"""Fixed-penalty variant (SURVEY.md §10 Q4): frozen fields stay at their
LADMM init while the rest train."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dladmm_tpu.data.synthetic import make_dictionary
from dladmm_tpu.models.unroll import init_dladmm_params
from dladmm_tpu.train.loop import TrainState, make_train_step


def test_frozen_beta_stays_at_init():
    A = make_dictionary(jax.random.PRNGKey(0), 20, 40)
    params = init_dladmm_params(A, K=4)
    opt = optax.adam(1e-2)
    step = make_train_step(
        opt, A, batch=8, freeze=("beta", "theta2"), donate=False
    )
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    for i in range(5):
        state, _ = step(state, jax.random.PRNGKey(i))
    np.testing.assert_array_equal(
        np.asarray(state.params.beta), np.asarray(params.beta)
    )
    np.testing.assert_array_equal(
        np.asarray(state.params.theta2), np.asarray(params.theta2)
    )
    # Unfrozen fields did move.
    assert float(jnp.abs(state.params.W1 - params.W1).max()) > 0
