import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_sr_algorithm_factory_all_archs(rng):
    from multi_frame_super_resolution_tpu.models.dnn_sr import (
        SR_ALGORITHMS,
        create_sr_model,
    )

    img = jnp.asarray(rng.random((10, 12, 3)).astype(np.float32))
    for algo in SR_ALGORITHMS:
        model = create_sr_model(algo, scale=2)
        params = model.init(jax.random.PRNGKey(0), img[None])
        out = dnn_sr(model, params, img)
        assert out.shape == (20, 24, 3), algo
    with pytest.raises(ValueError):
        create_sr_model("bicubic++")


def test_checkpoint_roundtrip(tmp_path, rng):
    from multi_frame_super_resolution_tpu.models.dnn_sr import (
        create_sr_model,
        load_params,
        save_params,
    )

    model = create_sr_model("fsrcnn", scale=2)
    img = jnp.asarray(rng.random((8, 8, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(2), img[None])
    path = str(tmp_path / "ck.npz")
    save_params(path, params, meta={"algo": "fsrcnn", "scale": 2})
    params2, meta = load_params(path)
    assert meta["algo"] == "fsrcnn"
    np.testing.assert_allclose(
        np.asarray(dnn_sr(model, params, img)),
        np.asarray(dnn_sr(model, params2, img)),
    )


@pytest.mark.parametrize("algo", ["espcn", "fsrcnn", "lapsrn", "edsr"])
def test_bundled_checkpoint_beats_bilinear(rng, algo):
    """Every committed x2 checkpoint must outperform bilinear upsampling
    on a held-out synthetic image (proves the weights are trained, not
    random — the reference's surface is pretrained inference for all four
    zoo algorithms, main.cpp:569-591)."""
    import os

    from multi_frame_super_resolution_tpu.data import synthetic_burst
    from multi_frame_super_resolution_tpu.models.dnn_sr import (
        create_sr_model,
        load_params,
    )
    from multi_frame_super_resolution_tpu.ops.geometry import resize
    from multi_frame_super_resolution_tpu.utils import psnr

    path = os.path.join(
        os.path.dirname(__file__), "..", "multi_frame_super_resolution_tpu",
        "data", "checkpoints", f"{algo}_x2.npz",
    )
    params, meta = load_params(path)
    assert meta["algo"] == algo
    model = create_sr_model(algo, scale=2)

    g, _ = synthetic_burst(rng, num_frames=1, height=64, width=64, max_shift=0.0)
    hr = jnp.asarray(np.stack([g[0]] * 3, axis=-1))
    lr = resize(hr, 32, 32, "bilinear")
    pred = dnn_sr(model, params, lr)
    base = jnp.clip(resize(lr, 64, 64, "bilinear"), 0, 1)
    p_model = float(psnr(hr, pred))
    p_base = float(psnr(hr, base))
    assert p_model > p_base + 0.5, (algo, p_model, p_base)


@pytest.mark.parametrize("algo", ["espcn", "fsrcnn", "lapsrn", "edsr"])
def test_bundled_checkpoint_cli_inference(tmp_path, rng, algo):
    """CLI inference form runs against every bundled checkpoint."""
    import os

    from multi_frame_super_resolution_tpu.apps import dnn_sr as app
    from multi_frame_super_resolution_tpu.data import imread, imwrite

    ck = os.path.join(
        os.path.dirname(__file__), "..", "multi_frame_super_resolution_tpu",
        "data", "checkpoints", f"{algo}_x2.npz",
    )
    img = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    imwrite(inp, img)
    assert app.main([ck, algo, "2", inp, outp]) == 0
    assert imread(outp).shape == (24, 32, 3)


def test_dnn_sr_cli(tmp_path, rng):
    from multi_frame_super_resolution_tpu.apps import dnn_sr as app
    from multi_frame_super_resolution_tpu.data import imwrite

    img = (rng.random((16, 20, 3)) * 255).astype(np.uint8)
    inp = str(tmp_path / "in.png")
    outp = str(tmp_path / "out.png")
    imwrite(inp, img)
    ck = str(tmp_path / "ck.npz")
    assert app.main(["train", ck, "fsrcnn", "2", "3"]) == 0
    assert app.main([ck, "fsrcnn", "2", inp, outp]) == 0
    from multi_frame_super_resolution_tpu.data import imread

    out = imread(outp)
    assert out.shape == (32, 40, 3)
    assert app.main([]) == 2
