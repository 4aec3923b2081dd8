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
           "ddpm_velocity", "parse_deep_cache"]


def parse_deep_cache(spec, default_groups: int = 3):
    """CLI/env DeepCache spec -> (interval, groups) tuple or None.

    Accepts the serving-menu incantation format shared by every knob
    surface (bench env vars, `--deep_cache` CLI flags): None/""/0 ->
    off; an int or "N" -> (N, default_groups); "N,G" -> (N, G). The
    gated recommendations are group-tuned ("2,2" for DepthFM), so the
    CLIs must be able to express the full tuple, not just the interval.
    """
    if spec is None or spec == "" or spec == 0:
        return None
    if isinstance(spec, (tuple, list)):
        interval, groups = spec
        return (int(interval), int(groups))
    if isinstance(spec, int):
        return (spec, default_groups)
    parts = str(spec).split(",")
    interval = int(parts[0])
    if interval == 0:
        return None
    groups = int(parts[1]) if len(parts) > 1 else default_groups
    return (interval, groups)


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
                joint_fn=None, deep_cache=None,
                n_train_timesteps: int = 1000, dtype=jnp.float32,
                beta_start: float = 0.00085, beta_end: float = 0.012):
    """Sample latents by DDIM.

    model_fn(x, t) -> predicted noise eps; `t` is a [B] int32 array of
    diffusion timesteps. With guidance_scale>1, `uncond_fn(x, t)` supplies
    the unconditional prediction for classifier-free guidance.
    `beta_start`/`beta_end` must match the training schedule (the
    DepthFMTrainer exposes them as config keys).

    `joint_fn(x2b, t2b) -> eps2b`: optional batched CFG evaluator — the
    caller stacks its conditional and unconditional contexts so the two
    guidance forwards run as ONE UNet call at batch 2B (exact; halves the
    number of sequential kernel launches — the demo's 100-step completion
    is launch-bound at batch 1). Used only when guidance_scale != 1.

    `deep_cache=(interval N, groups G)`: DeepCache step caching — every
    N-th DDIM step runs the full UNet (capturing the deep feature); the
    steps in between run only the G shallowest input/output groups with
    the cached feature spliced in (see `models.unet_ldm.apply_unet`).
    The model fns must then accept `deep_cache_groups=`/`cached_deep=`
    keywords (a full pass returns `(eps, deep)`). N=1 is bit-identical
    to the plain path; N>1 is an opt-in approximation."""
    alphas = linear_alphas_cumprod(n_train_timesteps, beta_start, beta_end)
    # uniform "leading" timestep spacing, descending
    step = n_train_timesteps // num_steps
    ts = (jnp.arange(num_steps, dtype=jnp.int32) * step)[::-1]

    x = jax.random.normal(rng, shape, dtype)
    b = shape[0]
    guided = guidance_scale != 1.0
    use_joint = guided and joint_fn is not None

    def eps_at(x, tb, **dc):
        """-> (guided eps, captured deep feature or None)."""
        deep = None
        if use_joint:
            out = joint_fn(jnp.concatenate([x, x], axis=0),
                           jnp.concatenate([tb, tb], axis=0), **dc)
            if dc.get("deep_cache_groups") is not None \
                    and dc.get("cached_deep") is None:
                out, deep = out
            eps, eps_u = out[:b], out[b:]
            return eps_u + guidance_scale * (eps - eps_u), deep
        if dc.get("deep_cache_groups") is not None \
                and dc.get("cached_deep") is None:
            eps, deep = model_fn(x, tb, **dc)
            if guided:
                eps_u, deep_u = uncond_fn(x, tb, **dc)
                eps = eps_u + guidance_scale * (eps - eps_u)
                deep = (deep, deep_u)
            return eps, deep
        if guided and dc.get("cached_deep") is not None:
            deep_c, deep_u = dc.pop("cached_deep")
            eps = model_fn(x, tb, cached_deep=deep_c, **dc)
            eps_u = uncond_fn(x, tb, cached_deep=deep_u, **dc)
            return eps_u + guidance_scale * (eps - eps_u), None
        eps = model_fn(x, tb, **dc)
        if guided:
            eps_u = uncond_fn(x, tb, **dc)
            eps = eps_u + guidance_scale * (eps - eps_u)
        return eps, None

    def update(x, i, eps):
        t = ts[i]
        t_prev = jnp.where(i < num_steps - 1, ts[i + 1], -1)
        a_t = alphas[t].astype(dtype)
        a_prev = jnp.where(t_prev >= 0, alphas[jnp.maximum(t_prev, 0)],
                           1.0).astype(dtype)
        x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps

    if deep_cache is None:
        def body(x, i):
            tb = jnp.full((b,), ts[i], jnp.int32)
            eps, _ = eps_at(x, tb)
            return update(x, i, eps), None

        x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
        return x

    interval, groups = deep_cache
    if num_steps % interval != 0:
        raise ValueError(f"deep_cache interval {interval} must divide "
                         f"num_steps {num_steps}")

    def block_body(x, blk):
        # one full step (captures the deep feature) + interval-1 shallow
        # steps reusing it; the shallow steps run under an inner scan
        # (deep is loop-invariant), so the traced program holds exactly
        # one full + one shallow UNet body regardless of the interval.
        i0 = blk * interval
        tb = jnp.full((b,), ts[i0], jnp.int32)
        eps, deep = eps_at(x, tb, deep_cache_groups=groups)
        x = update(x, i0, eps)

        def shallow_step(x, i):
            tb = jnp.full((b,), ts[i], jnp.int32)
            eps, _ = eps_at(x, tb, deep_cache_groups=groups,
                            cached_deep=deep)
            return update(x, i, eps), None

        if interval > 1:
            x, _ = jax.lax.scan(shallow_step, x,
                                i0 + 1 + jnp.arange(interval - 1))
        return x, None

    x, _ = jax.lax.scan(block_body, x,
                        jnp.arange(num_steps // interval))
    return x
