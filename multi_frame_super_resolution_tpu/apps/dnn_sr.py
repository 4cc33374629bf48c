"""Single-image DNN super-resolution CLI.

Mirrors the reference's cv::dnn_superres driver surface
(test_opencv/main.cpp:569-591):

    mfsr-dnn-sr MODEL_PATH ALGO SCALE INPUT [OUTPUT]
    mfsr-dnn-sr train MODEL_PATH ALGO SCALE [STEPS]

  * MODEL_PATH: npz checkpoint (readModel equivalent)
  * ALGO: espcn | fsrcnn | lapsrn | edsr (setModel equivalent)
  * SCALE: integer upsample factor
  * INPUT/OUTPUT: image paths (OUTPUT defaults to dnn_sr_result.png,
    matching the reference's imwrite of the upsampled frame)

The ``train`` form (beyond the reference, which only ran downloaded
weights) fits the chosen architecture on synthetic bursts and writes the
checkpoint consumed by the inference form — it is how the bundled test
checkpoint was produced.
"""

from __future__ import annotations

import sys


def _usage() -> int:
    print(__doc__)
    return 2


def _train(model_path: str, algo: str, scale: int, steps: int) -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.data import synthetic_burst
    from multi_frame_super_resolution_tpu.models.dnn_sr import (
        create_sr_model,
        init_state,
        make_train_step,
        save_params,
    )
    from multi_frame_super_resolution_tpu.ops.geometry import resize

    rng = np.random.default_rng(0)
    model = create_sr_model(algo, scale=scale)

    def batch(n=8, size=32):
        hrs, lrs = [], []
        for _ in range(n):
            g, _ = synthetic_burst(
                rng, num_frames=1, height=size * scale, width=size * scale,
                max_shift=0.0,
            )
            hr = np.stack([g[0]] * 3, axis=-1)
            lr = np.asarray(resize(jnp.asarray(hr), size, size, "bilinear"))
            hrs.append(hr)
            lrs.append(lr)
        return jnp.asarray(np.stack(lrs)), jnp.asarray(np.stack(hrs))

    data = [batch() for _ in range(12)]  # fixed dataset, cycled
    state, tx = init_state(model, jax.random.PRNGKey(0), data[0][0][:1])
    step = jax.jit(make_train_step(model, tx))
    for i in range(steps):
        lr, hr = data[i % len(data)]
        state, loss = step(state, lr, hr)
        if i % max(1, steps // 10) == 0:
            print(f"step {i}: loss {float(loss):.5f}")
    save_params(model_path, state.params, meta={"algo": algo, "scale": scale})
    print(f"saved {algo} x{scale} checkpoint to {model_path}")
    return 0


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "train":
        if len(argv) < 4:
            return _usage()
        steps = int(argv[4]) if len(argv) > 4 else 200
        return _train(argv[1], argv[2], int(argv[3]), steps)
    if len(argv) < 4:
        return _usage()
    model_path, algo, scale_s, input_path = argv[:4]
    output_path = argv[4] if len(argv) > 4 else "dnn_sr_result.png"
    scale = int(scale_s)

    import numpy as np

    import jax.numpy as jnp

    from multi_frame_super_resolution_tpu.data import imread, imwrite
    from multi_frame_super_resolution_tpu.models.dnn_sr import (
        create_sr_model,
        dnn_sr,
        load_params,
    )

    params, meta = load_params(model_path)
    if meta.get("algo") and meta["algo"] != algo.lower():
        print(
            f"warning: checkpoint was trained as {meta['algo']!r}, "
            f"requested {algo!r}"
        )
    model = create_sr_model(algo, scale=scale)
    img = imread(input_path)
    out = dnn_sr(model, params, jnp.asarray(img))
    imwrite(output_path, np.asarray(out))
    print(f"{algo} x{scale}: {img.shape} -> {tuple(out.shape)} -> {output_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
