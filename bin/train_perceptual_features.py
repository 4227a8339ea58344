"""Train the perceptual-loss feature extractor and save its weights.

The reference's PerceptualLoss wraps a pretrained VGG16 (reference:
py4cast/losses.py:213-260 via mfai); pretrained torchvision weights are
not downloadable here, so this trains a small convolutional encoder
from scratch as a denoising autoencoder on synthetic Gaussian random
fields (smooth multi-scale textures, the statistics of weather fields)
and ships the encoder as the perceptual feature pyramid
(py4cast_tpu/data/perceptual_feats.npz, ~60 KB).

Usage:  python bin/train_perceptual_features.py [--steps 800] [--out PATH]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]
DEFAULT_OUT = REPO / "py4cast_tpu" / "data" / "perceptual_feats.npz"

#: encoder layout: (in_ch, out_ch) per 3x3 conv scale
LAYERS = [(1, 16), (16, 32), (32, 32)]


def gaussian_random_fields(rng, n, size=64):
    """Power-law-spectrum random fields, per-image random slope — the
    multi-scale smooth textures weather fields are made of."""
    k = np.fft.fftfreq(size)[:, None] ** 2 + np.fft.fftfreq(size)[None, :] ** 2
    k = np.sqrt(k) + 1e-6
    alpha = rng.uniform(1.5, 3.5, size=(n, 1, 1))
    spectrum = k[None] ** (-alpha / 2.0)
    phases = rng.standard_normal((n, size, size)) + 1j * rng.standard_normal(
        (n, size, size)
    )
    fields = np.fft.ifft2(spectrum * phases).real
    fields -= fields.mean(axis=(1, 2), keepdims=True)
    fields /= fields.std(axis=(1, 2), keepdims=True) + 1e-8
    return fields[..., None].astype(np.float32)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", type=Path, default=DEFAULT_OUT)
    args = parser.parse_args()

    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(args.seed)

    def init_params():
        p = {}
        for i, (cin, cout) in enumerate(LAYERS):
            p[f"k{i}"] = (
                rng.standard_normal((3, 3, cin, cout)) / np.sqrt(9 * cin)
            ).astype(np.float32)
            p[f"b{i}"] = np.zeros(cout, np.float32)
        # decoder mirrors the encoder (discarded after training)
        for i, (cout, cin) in enumerate(reversed(LAYERS)):
            p[f"dk{i}"] = (
                rng.standard_normal((3, 3, cin, cout)) / np.sqrt(9 * cin)
            ).astype(np.float32)
            p[f"db{i}"] = np.zeros(cout, np.float32)
        return {k: jnp.asarray(v) for k, v in p.items()}

    def conv(x, k, b):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + b

    def encode(p, x):
        feats = []
        h = x
        for i in range(len(LAYERS)):
            h = jnp.maximum(conv(h, p[f"k{i}"], p[f"b{i}"]), 0.0)
            feats.append(h)
            h = h[:, ::2, ::2, :]
        return feats, h

    def decode(p, h):
        for i in range(len(LAYERS)):
            b, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv(h, p[f"dk{i}"], p[f"db{i}"])
            if i < len(LAYERS) - 1:
                h = jnp.maximum(h, 0.0)
        return h

    def loss_fn(p, noisy, clean):
        _, code = encode(p, noisy)
        recon = decode(p, code)
        return jnp.mean((recon - clean) ** 2)

    params = init_params()
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    @jax.jit
    def step(p, s, noisy, clean):
        loss, grads = jax.value_and_grad(loss_fn)(p, noisy, clean)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    for i in range(args.steps):
        clean = gaussian_random_fields(rng, args.batch)
        noisy = clean + 0.3 * rng.standard_normal(clean.shape).astype(np.float32)
        params, opt_state, loss = step(params, opt_state, noisy, clean)
        if i % 100 == 0 or i == args.steps - 1:
            print(f"step {i}: denoise mse {float(loss):.4f}")

    out = {
        k: np.asarray(v)
        for k, v in params.items()
        if not k.startswith(("dk", "db"))  # ship the encoder only
    }
    args.out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.out, **out)
    size_kb = args.out.stat().st_size / 1024
    print(f"Saved encoder ({size_kb:.0f} KB) to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
