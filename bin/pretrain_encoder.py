"""Self-supervised offline pretraining for the ResNet UNet/DeepLab encoder.

Zero-egress substitute for ImageNet encoder weights (reference:
config/CLI/model/customunet.yaml `encoder_weights`): trains the Flax
ResNetEncoder as a denoising autoencoder on synthetic power-law random
fields (multi-scale textures with weather-field statistics) and saves
the encoder in the npz format `encoder_weights: true` loads
(py4cast_tpu/models/pretrained.py).

Usage:
    python bin/pretrain_encoder.py [--encoder resnet18] [--steps 500] \
        [--size 64] [--out PATH]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def gaussian_random_fields(rng, n, size, channels=3):
    k = np.fft.fftfreq(size)[:, None] ** 2 + np.fft.fftfreq(size)[None, :] ** 2
    k = np.sqrt(k) + 1e-6
    alpha = rng.uniform(1.5, 3.5, size=(n, channels, 1, 1))
    spectrum = k[None, None] ** (-alpha / 2.0)
    phases = rng.standard_normal((n, channels, size, size)) + 1j * (
        rng.standard_normal((n, channels, size, size))
    )
    fields = np.fft.ifft2(spectrum * phases).real
    fields -= fields.mean(axis=(2, 3), keepdims=True)
    fields /= fields.std(axis=(2, 3), keepdims=True) + 1e-8
    return np.moveaxis(fields, 1, -1).astype(np.float32)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--encoder", default="resnet18",
                        choices=["resnet18", "resnet34"])
    parser.add_argument("--steps", type=int, default=500)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args(argv)

    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import flax.linen as nn
    import jax.numpy as jnp
    import optax
    from flax import traverse_util

    from py4cast_tpu.models.pretrained import (
        default_weights_path,
        save_encoder_npz,
    )
    from py4cast_tpu.models.unet import ResNetEncoder

    class DenoiseAE(nn.Module):
        """UNet-style decoder WITH skip connections: a pure 2×2
        bottleneck decoder collapses to predicting the field mean
        (measured: plain ReLU decoder dies — gradnorm → 0 with MSE
        pinned at 1.0) and trains the encoder nothing; skips force
        every encoder stage to carry usable features, which is exactly
        what the downstream CustomUNet/DeepLab consume."""

        encoder_name: str

        @nn.compact
        def __call__(self, x):
            feats = ResNetEncoder(self.encoder_name, 5, name="encoder")(x)
            y = feats[-1]
            for skip in reversed(feats[:-1]):
                b, h, w, _ = skip.shape
                y = jax.image.resize(y, (b, h, w, y.shape[-1]), "nearest")
                y = jnp.concatenate([y, skip], axis=-1)
                y = nn.GroupNorm(num_groups=8)(nn.Conv(64, (3, 3))(y))
                y = nn.gelu(y)
            b, h, w, _ = y.shape
            y = jax.image.resize(y, (b, x.shape[1], x.shape[2], y.shape[-1]),
                                 "nearest")
            y = nn.gelu(nn.GroupNorm(num_groups=8)(nn.Conv(32, (3, 3))(y)))
            return nn.Conv(x.shape[-1], (1, 1))(y)

    rng = np.random.default_rng(args.seed)
    model = DenoiseAE(args.encoder)
    x0 = jnp.zeros((1, args.size, args.size, 3), jnp.float32)
    params = model.init(jax.random.key(args.seed), x0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(p, s, noisy, clean):
        def loss_fn(p):
            return jnp.mean((model.apply(p, noisy) - clean) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(p)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(args.steps):
        clean = gaussian_random_fields(rng, args.batch, args.size)
        noisy = clean + 0.3 * rng.standard_normal(clean.shape).astype(np.float32)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(noisy), jnp.asarray(clean))
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: denoise mse {float(loss):.4f}")

    enc = traverse_util.flatten_dict(
        params["params"]["encoder"], sep="/"
    )
    out = args.out or default_weights_path(args.encoder)
    save_encoder_npz(
        out, {k: np.asarray(v) for k, v in enc.items()},
        {"encoder_name": args.encoder, "norm": "group", "in_channels": 3,
         "source": "selfsupervised-grf"},
    )
    print(f"Wrote encoder ({len(enc)} arrays) to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
