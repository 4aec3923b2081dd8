"""DepthFM / DepthFMAmodal: flow-matching depth in SD latent space.

TPU-native re-design of the reference generative branch
(`src/models/depthfm/dfm.py:17-159`, `dfm_amodal.py:34-346`):

  * SD-1.5 VAE encodes rgb / guide-rgb / depth into 4-ch latents
    (`models.vae`); mask/observation guides are bilinearly downsampled to
    latent resolution (`dfm_amodal.py:185-219`).
  * The LDM UNet (`models.unet_ldm`) takes x_t with the conditioning
    latents concatenated on channels and the empty-text embedding via
    cross-attention; conv-in is widened by `additional_dim` channels with
    zero-initialized new weights (`dfm_amodal.py:70-83`).
  * Train: x_0 = cosine-noised rgb latent at noising_step, x_1 = depth
    latent, x_t linear interp at random t; target = x_1 - x_0
    (`dfm_amodal.py:225-244`). All randomness is explicit PRNG keys.
  * Eval: Euler ODE from q_sample(rgb latent) over `num_steps` as a
    `lax.scan` (replaces torchdiffeq.odeint, `dfm.py:38-57`), decode,
    channel-mean, depth = 1 - clamp((d+1)/2) (`dfm_amodal.py:246-265`).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..ops.resize import resize2d
from .unet_ldm import UNetConfig, apply_unet, init_unet
from .vae import SD_VAE, init_vae, vae_decode, vae_encode_mode

__all__ = ["DepthFMConfig", "init_depthfm", "depthfm_train_outputs",
           "depthfm_generate", "depthfm_predict_depth", "q_sample",
           "cosine_alpha_bar"]

# guide latent channels: VAE latent (4) for image; 1 each for mask/obs
GUIDE_LATENT_DIMS = {
    "image+mask+observation": 6, "image+mask": 5, "image+observation": 5,
    "mask+observation": 2, "mask": 1, "observation": 1, "image": 4,
    "none": 0,
}


@dataclasses.dataclass(frozen=True)
class DepthFMConfig:
    guide_type: str = "mask+observation"
    noising_step: int = 400
    n_diffusion_timesteps: int = 1000
    context_dim: int = 1024
    context_len: int = 77
    # UNet size (SD-1.5 defaults; shrink for tests)
    model_channels: int = 320
    channel_mult: tuple = (1, 2, 4, 4)
    num_heads: int = 8
    num_res_blocks: int = 2
    # VAE size
    vae_channels: tuple = (128, 256, 512, 512)
    vae_layers: int = 2

    @property
    def additional_dim(self) -> int:
        return GUIDE_LATENT_DIMS[self.guide_type]

    @property
    def unet(self) -> UNetConfig:
        # base DepthFM UNet is 8-in (rgb latent 4 + depth latent 4); the
        # amodal variant widens conv-in by additional_dim
        return UNetConfig(in_channels=8 + self.additional_dim,
                          context_dim=self.context_dim,
                          model_channels=self.model_channels,
                          channel_mult=self.channel_mult,
                          num_heads=self.num_heads,
                          num_res_blocks=self.num_res_blocks)

    @property
    def vae(self):
        from .vae import VAEConfig
        return VAEConfig(block_out_channels=self.vae_channels,
                         layers_per_block=self.vae_layers)


def cosine_alpha_bar(t):
    """sigmoid(-2 log(tan(pi t / 2) + eps)) (reference dfm_amodal.py:305-318)."""
    eps = 1e-5
    log_snr = -2.0 * jnp.log(jnp.tan((jnp.pi * t) / 2.0) + eps)
    return jax.nn.sigmoid(log_snr)


def q_sample(x_start, t, noise, n_diffusion_timesteps: int = 1000):
    """Cosine-schedule forward noising q(x_t | x_0); t in diffusion steps."""
    ab = cosine_alpha_bar(jnp.asarray(t, jnp.float32) / n_diffusion_timesteps)
    ab = ab.astype(x_start.dtype)
    return jnp.sqrt(ab) * x_start + jnp.sqrt(1.0 - ab) * noise


def init_depthfm(key, cfg: DepthFMConfig) -> dict:
    k_vae, k_unet, _ = jax.random.split(key, 3)
    unet = init_unet(k_unet, cfg.unet)
    # conv-in widening contract: first 8 input channels hold the pretrained
    # kernel; the guidance channels start zero (reference dfm_amodal.py:74-81)
    w = unet["input_blocks"]["0"]["0"]["w"]
    zeroed = w.at[:, :, 8:, :].set(0.0) if w.shape[2] > 8 else w
    unet["input_blocks"]["0"]["0"]["w"] = zeroed
    return {
        "vae": init_vae(k_vae, cfg.vae),
        "unet": unet,
        "empty_text_embed": jnp.zeros((1, cfg.context_len, cfg.context_dim),
                                      jnp.float32),
    }


def _guide_latents(params, cfg: DepthFMConfig, rgb_latent, guide_rgb,
                   guide_mask, observation):
    """Conditioning latents concatenated after the rgb latent
    (reference dfm_amodal.py:185-219)."""
    lh, lw = rgb_latent.shape[1:3]

    def down(x):
        return resize2d(x, size=(lh, lw), method="bilinear")

    parts = []
    if "image" in cfg.guide_type:
        if guide_rgb is None:
            raise ValueError("guide_type includes image: guide_rgb required")
        parts.append(vae_encode_mode(params["vae"], guide_rgb, cfg.vae))
    if "mask" in cfg.guide_type:
        parts.append(down(guide_mask))
    if "observation" in cfg.guide_type:
        parts.append(down(observation))
    if not parts:
        return rgb_latent
    return jnp.concatenate([rgb_latent] + parts, axis=-1)


def _conditioning(params, batch_size, dtype):
    e = params["empty_text_embed"].astype(dtype)
    return jnp.broadcast_to(e, (batch_size, *e.shape[1:]))


def depthfm_train_outputs(params: dict, cfg: DepthFMConfig, rng, ims, depth, *,
                          guide_rgb=None, guide_mask=None, observation=None,
                          attn_impl=None, remat=False):
    """ims: [B,H,W,3] in [-1,1]; depth: [B,H,W,1] in [0,1].

    Returns (model_pred, target) latents [B,h,w,4]."""
    k_noise0, k_t, k_noise_unused = jax.random.split(rng, 3)
    rgb_latent = vae_encode_mode(params["vae"], ims, cfg.vae)
    cond_latent = _guide_latents(params, cfg, rgb_latent, guide_rgb,
                                 guide_mask, observation)
    conditioning = _conditioning(params, ims.shape[0], ims.dtype)

    depth_in = (1.0 - depth) * 2.0 - 1.0
    depth_3 = jnp.repeat(depth_in, 3, axis=-1)
    x_1 = vae_encode_mode(params["vae"], depth_3, cfg.vae)
    noise = jax.random.normal(k_noise0, rgb_latent.shape, rgb_latent.dtype)
    x_0 = q_sample(rgb_latent, cfg.noising_step, noise,
                   cfg.n_diffusion_timesteps)
    t_int = jax.random.randint(k_t, (ims.shape[0], 1, 1, 1), 0,
                               cfg.noising_step)
    t = t_int.astype(ims.dtype) / cfg.noising_step
    x_t = (1.0 - t) * x_0 + t * x_1
    target = x_1 - x_0
    model_pred = apply_unet(params["unet"], cfg.unet, x_t, t[:, 0, 0, 0],
                            context=cond_latent, context_ca=conditioning,
                            attn_impl=attn_impl, remat=remat)
    return model_pred, target


def _euler_depth(params, cfg: DepthFMConfig, rng, rgb_latent, cond_latent,
                 conditioning, num_steps: int, dtype, attn_impl, tome=None,
                 deep_cache=None):
    """q_sample -> fixed-step Euler ODE -> decode -> channel-mean depth
    (shared by the amodal eval and the plain predict paths).

    deep_cache=(interval N, shallow groups G): DeepCache step caching —
    every N-th Euler step runs the full UNet and captures the deep
    feature; the N-1 steps in between run only the G shallowest
    input/output groups and splice the cached feature in (see
    `apply_unet`). N=1 is bit-identical to the plain path (every step
    full; tested). Opt-in serving knob, parity-breaking for N>1."""
    noise = jax.random.normal(rng, rgb_latent.shape, rgb_latent.dtype)
    z = q_sample(rgb_latent, cfg.noising_step, noise,
                 cfg.n_diffusion_timesteps)
    dt = 1.0 / num_steps
    ts = jnp.arange(num_steps, dtype=dtype) * dt
    b = rgb_latent.shape[0]

    def vfield(z, t, **kw):
        return apply_unet(params["unet"], cfg.unet, z,
                          jnp.full((b,), t, dtype),
                          context=cond_latent, context_ca=conditioning,
                          attn_impl=attn_impl, tome=tome, **kw)

    if deep_cache is None:
        def euler_step(z, t):
            return z + dt * vfield(z, t), None

        z, _ = jax.lax.scan(euler_step, z, ts)
    else:
        interval, groups = deep_cache
        if num_steps % interval != 0:
            raise ValueError(
                f"deep_cache interval {interval} must divide "
                f"num_steps {num_steps}")

        def cached_block(z, t_vec):
            # one full step (captures the deep feature) + interval-1
            # shallow steps reusing it; the shallow steps run under an
            # inner scan (deep is loop-invariant), so the traced program
            # holds one full + one shallow UNet body at any interval.
            v, deep = vfield(z, t_vec[0], deep_cache_groups=groups)
            z = z + dt * v

            def shallow_step(z, t):
                v = vfield(z, t, deep_cache_groups=groups,
                           cached_deep=deep)
                return z + dt * v, None

            if interval > 1:
                z, _ = jax.lax.scan(shallow_step, z, t_vec[1:])
            return z, None

        z, _ = jax.lax.scan(cached_block, z,
                            ts.reshape(num_steps // interval, interval))
    decoded = vae_decode(params["vae"], z, cfg.vae)
    return jnp.mean(decoded, axis=-1, keepdims=True)


def depthfm_generate(params: dict, cfg: DepthFMConfig, rng, ims, *,
                     num_steps: int = 4, guide_rgb=None, guide_mask=None,
                     observation=None, attn_impl=None, tome=None,
                     deep_cache=None):
    """Euler ODE from noised rgb latent to depth latent; returns depth
    [B,H,W,1] in [0,1] (far = 0 after the 1-x flip, dfm_amodal.py:261-262)."""
    rgb_latent = vae_encode_mode(params["vae"], ims, cfg.vae)
    cond_latent = _guide_latents(params, cfg, rgb_latent, guide_rgb,
                                 guide_mask, observation)
    conditioning = _conditioning(params, ims.shape[0], ims.dtype)
    depth = _euler_depth(params, cfg, rng, rgb_latent, cond_latent,
                         conditioning, num_steps, ims.dtype, attn_impl,
                         tome=tome, deep_cache=deep_cache)
    depth = jnp.clip((depth + 1.0) / 2.0, 0.0, 1.0)
    return 1.0 - depth


def depthfm_predict_depth(params: dict, cfg: DepthFMConfig, rng, ims, *,
                          num_steps: int = 4, ensemble_size: int = 1,
                          attn_impl=None, tome=None, deep_cache=None):
    """PLAIN DepthFM inference (reference `dfm.py:59-94` — the pseudo-
    label factory's labeler, `sam_pl_gen.py:56-61`): batch-repeat
    `ensemble_size` copies (each draws its own q_sample noise), Euler
    solve, decode, channel-mean, ensemble-mean, then
    per-sample min-max of exp(depth). ims: [1,H,W,3] in [-1,1] when
    ensembling (reference asserts batch 1), else [B,H,W,3].

    Returns [B,H,W,1] in [0,1] — NOTE: no 1-x flip (that is the amodal
    eval convention, `dfm_amodal.py:261-262`)."""
    assert cfg.guide_type == "none", \
        "plain predict_depth is the unguided path (dfm.py); use " \
        "depthfm_generate for guided configs"
    rgb_latent = vae_encode_mode(params["vae"], ims, cfg.vae)
    if ensemble_size > 1:
        assert ims.shape[0] == 1, "ensemble mode needs batch 1 (dfm.py:67)"
        # encode ONCE: vae_encode_mode is deterministic (posterior mean),
        # so the reference's repeat-then-encode (dfm.py:68-72) does
        # ensemble_size identical encoder passes; repeating the latent
        # is numerically identical and skips them. Each ensemble member
        # still draws its own q_sample noise.
        rgb_latent = jnp.repeat(rgb_latent, ensemble_size, axis=0)
    cond_latent = _guide_latents(params, cfg, rgb_latent, None, None, None)
    conditioning = _conditioning(params, rgb_latent.shape[0], ims.dtype)
    depth = _euler_depth(params, cfg, rng, rgb_latent, cond_latent,
                         conditioning, num_steps, ims.dtype, attn_impl,
                         tome=tome, deep_cache=deep_cache)
    if ensemble_size > 1:
        depth = jnp.mean(depth, axis=0, keepdims=True)
    depth = jnp.exp(depth.astype(jnp.float32))
    lo = jnp.min(depth, axis=(1, 2, 3), keepdims=True)
    hi = jnp.max(depth, axis=(1, 2, 3), keepdims=True)
    return (depth - lo) / jnp.maximum(hi - lo, 1e-8)
