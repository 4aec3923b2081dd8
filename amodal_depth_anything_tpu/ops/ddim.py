"""DDIM sampler as a `lax.scan` (TPU-compiled, fixed step count).

Replaces the reference demo's pix2gestalt DDIMSampler (100 steps,
`app.py:120-122` via the external pix2gestalt clone) with a jit-fused
deterministic (eta=0) DDIM loop supporting classifier-free guidance.
The noise schedule is the LDM linear beta schedule (SD-1.5 defaults).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["ddim_sample", "linear_alphas_cumprod", "ddpm_add_noise",
           "ddpm_velocity"]


def linear_alphas_cumprod(n_timesteps: int = 1000, beta_start: float = 0.00085,
                          beta_end: float = 0.012) -> jnp.ndarray:
    """SD 'scaled_linear' schedule: betas linear in sqrt space."""
    betas = jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, n_timesteps,
                         dtype=jnp.float32) ** 2
    return jnp.cumprod(1.0 - betas)


def _gather_ab(alphas_cumprod, t, like):
    ab = alphas_cumprod[t].astype(like.dtype)
    return ab.reshape(ab.shape + (1,) * (like.ndim - ab.ndim))


def ddpm_add_noise(alphas_cumprod, x0, noise, t):
    """DDPM forward process q(x_t | x_0) with per-sample integer timesteps
    (diffusers `DDPMScheduler.add_noise`, the noising the reference's
    `DepthFMTrainer` applies at `src/trainer/depthfm_trainer.py:268-270`):
    sqrt(ab_t)*x0 + sqrt(1-ab_t)*eps. t: [B] int32; x0/noise [B,...]."""
    ab = _gather_ab(alphas_cumprod, t, x0)
    return jnp.sqrt(ab) * x0 + jnp.sqrt(1.0 - ab) * noise


def ddpm_velocity(alphas_cumprod, x0, noise, t):
    """v-prediction target (diffusers `get_velocity`, reference
    `depthfm_trainer.py:296-298`): sqrt(ab_t)*eps - sqrt(1-ab_t)*x0."""
    ab = _gather_ab(alphas_cumprod, t, x0)
    return jnp.sqrt(ab) * noise - jnp.sqrt(1.0 - ab) * x0


def ddim_sample(model_fn, rng, shape, *, num_steps: int = 50,
                guidance_scale: float = 1.0, uncond_fn=None,
                n_train_timesteps: int = 1000, dtype=jnp.float32,
                beta_start: float = 0.00085, beta_end: float = 0.012):
    """Sample latents by DDIM.

    model_fn(x, t) -> predicted noise eps; `t` is a [B] int32 array of
    diffusion timesteps. With guidance_scale>1, `uncond_fn(x, t)` supplies
    the unconditional prediction for classifier-free guidance.
    `beta_start`/`beta_end` must match the training schedule (the
    DepthFMTrainer exposes them as config keys).
    """
    alphas = linear_alphas_cumprod(n_train_timesteps, beta_start, beta_end)
    # uniform "leading" timestep spacing, descending
    step = n_train_timesteps // num_steps
    ts = (jnp.arange(num_steps, dtype=jnp.int32) * step)[::-1]

    x = jax.random.normal(rng, shape, dtype)
    b = shape[0]

    def body(x, i):
        t = ts[i]
        t_prev = jnp.where(i < num_steps - 1, ts[i + 1], -1)
        a_t = alphas[t].astype(dtype)
        a_prev = jnp.where(t_prev >= 0, alphas[jnp.maximum(t_prev, 0)],
                           1.0).astype(dtype)
        tb = jnp.full((b,), t, jnp.int32)
        eps = model_fn(x, tb)
        if guidance_scale != 1.0:
            eps_u = uncond_fn(x, tb)
            eps = eps_u + guidance_scale * (eps - eps_u)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        x = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps
        return x, None

    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
    return x
