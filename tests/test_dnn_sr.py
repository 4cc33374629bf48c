import jax
import jax.numpy as jnp
import numpy as np

from multi_frame_super_resolution_tpu.models.dnn_sr import (
    ESPCN,
    create_model,
    dnn_sr,
    init_state,
    make_train_step,
)


def test_espcn_shapes(rng):
    model = create_model(scale=2, features=16)
    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(params, x)
    assert y.shape == (2, 32, 32, 3)


def test_espcn_training_reduces_loss(rng):
    model = create_model(scale=2, features=16)
    lr = jnp.asarray(rng.random((4, 12, 12, 3)).astype(np.float32))
    hr = jnp.asarray(rng.random((4, 24, 24, 3)).astype(np.float32))
    state, tx = init_state(model, jax.random.PRNGKey(0), lr[:1], learning_rate=1e-2)
    step = jax.jit(make_train_step(model, tx))
    state, first = step(state, lr, hr)
    for _ in range(20):
        state, loss = step(state, lr, hr)
    assert float(loss) < float(first)


def test_dnn_sr_inference(rng):
    model = create_model(scale=3, features=8)
    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), img[None])
    out = dnn_sr(model, params, img)
    assert out.shape == (24, 24, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
