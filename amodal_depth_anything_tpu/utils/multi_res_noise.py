"""Multi-resolution pyramid noise (reference `src/util/multi_res_noise.py:8-74`).

Used by the diffusion trainers to correlate noise across scales. Four
strategies over how the per-octave scale decays; all jit-friendly with
explicit PRNG keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.resize import resize2d

__all__ = ["multi_res_noise_like"]


def multi_res_noise_like(rng, x, *, strength: float = 0.9,
                         downscale_strategy: str = "original",
                         annealed_t=None):
    """x: [B,H,W,C]; returns correlated noise of the same shape, unit-var.

    strategies: 'original' (scale^i with random halvings),
    'every_layer', 'power_of_two', 'random_step'."""
    if annealed_t is not None:
        strength = strength * annealed_t
    b, h, w, c = x.shape
    keys = jax.random.split(rng, 16)
    noise = jax.random.normal(keys[0], x.shape, x.dtype)

    if downscale_strategy == "original":
        scales, cur_h, cur_w = [], h, w
        for i in range(1, 16):
            cur_h, cur_w = max(1, cur_h // 2), max(1, cur_w // 2)
            scales.append((cur_h, cur_w, strength ** i))
            if cur_h == 1 and cur_w == 1:
                break
    elif downscale_strategy == "every_layer":
        scales = [(max(1, h // (2 ** i)), max(1, w // (2 ** i)),
                   strength ** i) for i in range(1, int(jnp.log2(min(h, w))))]
    elif downscale_strategy == "power_of_two":
        scales = [(max(1, h // (2 ** i)), max(1, w // (2 ** i)),
                   strength ** i) for i in range(1, 5)]
    elif downscale_strategy == "random_step":
        scales = [(max(1, h // (3 ** i)), max(1, w // (3 ** i)),
                   strength ** i) for i in range(1, 4)]
    else:
        raise ValueError(f"unknown strategy {downscale_strategy!r}")

    for i, (sh, sw, s) in enumerate(scales):
        low = jax.random.normal(keys[i + 1], (b, sh, sw, c), x.dtype)
        up = resize2d(low, size=(h, w), method="bilinear")
        noise = noise + up * s
        if sh == 1 and sw == 1:
            break
    return noise / jnp.std(noise)
