"""Single-image DNN super-resolution (ESPCN-style).

The reference exposes DNN SR through cv::dnn_superres with downloadable
models (dnn_sr, main.cpp:569-591: algorithm name + scale from argv). Here
the equivalent capability is a trainable flax CNN with sub-pixel
(pixel-shuffle) upsampling plus an optax training step, designed to shard
over the device mesh: batch on the 'data' axis, conv feature channels on
the 'model' axis (tensor parallelism via sharding constraints — XLA
inserts the collectives).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

import flax.linen as nn
import optax
from jax.sharding import PartitionSpec as P


class ESPCN(nn.Module):
    """Efficient sub-pixel CNN: features -> shrink -> scale^2*C channels ->
    pixel shuffle."""

    scale: int = 2
    channels: int = 3
    features: int = 64

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, C) low-res
        h = nn.Conv(self.features, (5, 5), padding="SAME")(x)
        h = nn.relu(h)
        h = _shard_channels(h)
        h = nn.Conv(self.features // 2, (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        h = _shard_channels(h)
        h = nn.Conv(self.channels * self.scale * self.scale, (3, 3), padding="SAME")(h)
        # pixel shuffle (B, H, W, C*s*s) -> (B, H*s, W*s, C)
        b, hh, ww, _ = h.shape
        s = self.scale
        h = h.reshape(b, hh, ww, s, s, self.channels)
        h = h.transpose(0, 1, 3, 2, 4, 5)
        return h.reshape(b, hh * s, ww * s, self.channels)


def _shard_channels(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain activations to (data, -, -, model) when inside a mesh
    context; no-op otherwise."""
    try:
        return jax.lax.with_sharding_constraint(x, P("data", None, None, "model"))
    except (ValueError, RuntimeError):
        return x


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any

    def tree_flatten(self):  # pragma: no cover - convenience
        return (self.params, self.opt_state), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state), None),
    lambda _, c: TrainState(*c),
)


def create_model(scale: int = 2, channels: int = 3, features: int = 64) -> ESPCN:
    return ESPCN(scale=scale, channels=channels, features=features)


def init_state(
    model: ESPCN, rng: jax.Array, sample: jnp.ndarray, learning_rate: float = 1e-3
) -> Tuple[TrainState, optax.GradientTransformation]:
    params = model.init(rng, sample)
    tx = optax.adam(learning_rate)
    return TrainState(params=params, opt_state=tx.init(params)), tx


def loss_fn(model: ESPCN, params, lr_batch: jnp.ndarray, hr_batch: jnp.ndarray):
    pred = model.apply(params, lr_batch)
    return jnp.mean((pred - hr_batch) ** 2)


def make_train_step(model: ESPCN, tx: optax.GradientTransformation):
    """Jittable (state, lr, hr) -> (state, loss) SGD step."""

    def train_step(state: TrainState, lr_batch: jnp.ndarray, hr_batch: jnp.ndarray):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(model, p, lr_batch, hr_batch))(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state), loss

    return train_step


def dnn_sr(model: ESPCN, params, img: jnp.ndarray) -> jnp.ndarray:
    """Single-image SR inference on (H, W, C) in [0, 1]."""
    out = model.apply(params, img[None])
    return jnp.clip(out[0], 0.0, 1.0)
