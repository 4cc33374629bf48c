"""Single-image DNN super-resolution model zoo.

The reference exposes DNN SR through cv::dnn_superres with downloadable
models (dnn_sr, main.cpp:569-591: model file + algorithm name from argv,
x2 upsample). The equivalent surface here:

  * ``create_sr_model(algo, scale)`` — the algorithm selector covering
    the cv::dnn_superres zoo names: espcn | fsrcnn | lapsrn | edsr
    (compact flax incarnations of each architecture family)
  * ``save_params`` / ``load_params`` — npz checkpoint round trip (the
    "model file" of the reference surface)
  * ``dnn_sr(model, params, img)`` — single-image inference
  * training utilities (init_state / make_train_step) — beyond the
    reference (which only ran pretrained weights), designed to shard
    over the device mesh: batch on the 'data' axis, conv feature
    channels on the 'model' axis via sharding constraints.
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


def _pixel_shuffle(h: jnp.ndarray, scale: int, channels: int) -> jnp.ndarray:
    """(B, H, W, C*s*s) -> (B, H*s, W*s, C)."""
    b, hh, ww, _ = h.shape
    s = scale
    h = h.reshape(b, hh, ww, s, s, channels)
    h = h.transpose(0, 1, 3, 2, 4, 5)
    return h.reshape(b, hh * s, ww * s, channels)


def _upsample_bilinear(x: jnp.ndarray, s: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * s, w * s, c), "bilinear")


class FSRCNN(nn.Module):
    """FSRCNN family: feature extraction -> shrink -> mapping -> expand ->
    sub-pixel upsample (compact stand-in for the fsrcnn .pb zoo models)."""

    scale: int = 2
    channels: int = 3
    d: int = 32          # feature dim
    s_feat: int = 8      # shrunk mapping dim
    m: int = 2           # mapping depth

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.relu(nn.Conv(self.d, (5, 5), padding="SAME")(x))
        h = _shard_channels(h)
        h = nn.relu(nn.Conv(self.s_feat, (1, 1))(h))
        for _ in range(self.m):
            h = nn.relu(nn.Conv(self.s_feat, (3, 3), padding="SAME")(h))
        h = nn.relu(nn.Conv(self.d, (1, 1))(h))
        h = _shard_channels(h)
        h = nn.Conv(self.channels * self.scale**2, (3, 3), padding="SAME")(h)
        return _pixel_shuffle(h, self.scale, self.channels)


class LapSRN(nn.Module):
    """LapSRN family: progressive x2 stages, each predicting a Laplacian
    residual added to the bilinearly upsampled image. scale must be a
    power of two (as in the lapsrn zoo: x2/x4/x8)."""

    scale: int = 2
    channels: int = 3
    features: int = 32
    depth: int = 3       # convs per stage

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = self.scale
        assert s & (s - 1) == 0 and s > 1, "lapsrn scale must be 2^k"
        img = x
        feat = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(x))
        while s > 1:
            for _ in range(self.depth):
                feat = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(feat))
                feat = _shard_channels(feat)
            feat = _pixel_shuffle(
                nn.Conv(self.features * 4, (3, 3), padding="SAME")(feat),
                2, self.features,
            )
            residual = nn.Conv(self.channels, (3, 3), padding="SAME")(feat)
            img = _upsample_bilinear(img, 2) + residual
            s //= 2
        return img


class EDSR(nn.Module):
    """EDSR family: residual blocks without batch norm + global skip,
    sub-pixel upsample (compact stand-in for the edsr zoo models)."""

    scale: int = 2
    channels: int = 3
    features: int = 32
    blocks: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        head = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        h = head
        for _ in range(self.blocks):
            r = nn.relu(nn.Conv(self.features, (3, 3), padding="SAME")(h))
            r = _shard_channels(r)
            r = nn.Conv(self.features, (3, 3), padding="SAME")(r)
            h = h + 0.1 * r
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h) + head
        h = nn.Conv(self.channels * self.scale**2, (3, 3), padding="SAME")(h)
        return _pixel_shuffle(h, self.scale, self.channels) + _upsample_bilinear(
            x, self.scale
        )


SR_ALGORITHMS = ("espcn", "fsrcnn", "lapsrn", "edsr")


def create_sr_model(algo: str, scale: int = 2, channels: int = 3, **kw) -> nn.Module:
    """Algorithm selector mirroring cv::dnn_superres setModel(algo, scale)
    (main.cpp:582-584). Unknown names raise ValueError (the reference
    segfaults instead)."""
    algo = algo.lower()
    if algo == "espcn":
        return ESPCN(scale=scale, channels=channels, **kw)
    if algo == "fsrcnn":
        return FSRCNN(scale=scale, channels=channels, **kw)
    if algo == "lapsrn":
        return LapSRN(scale=scale, channels=channels, **kw)
    if algo == "edsr":
        return EDSR(scale=scale, channels=channels, **kw)
    raise ValueError(f"unknown SR algorithm {algo!r}; choose from {SR_ALGORITHMS}")


def save_params(path: str, params, meta: dict | None = None) -> None:
    """Serialize a flax params pytree to npz ('/'-joined path keys), plus
    optional string metadata under '__meta_*' keys — the framework's
    equivalent of the reference's readModel(model_path)."""
    import numpy as np

    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            getattr(k, "key", getattr(k, "idx", None)).__str__() for k in keypath
        )
        flat[key] = np.asarray(leaf)
    for k, v in (meta or {}).items():
        flat[f"__meta_{k}"] = np.asarray(str(v))
    np.savez(path, **flat)


def load_params(path: str):
    """Load an npz checkpoint back into a nested params dict. Returns
    (params, meta)."""
    import numpy as np

    data = np.load(path, allow_pickle=False)
    params: dict = {}
    meta: dict = {}
    for key in data.files:
        if key.startswith("__meta_"):
            meta[key[len("__meta_"):]] = str(data[key])
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return params, meta


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
