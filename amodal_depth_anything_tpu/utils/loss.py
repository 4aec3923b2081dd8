"""Training losses (jit-friendly, mask-aware).

Functional equivalents of the reference loss bank
(`src/util/loss.py:7-139`): SILog pixel loss (the configured training
loss, beta=0.15 — `config/train_discriminative_vitl.yaml:48-52`),
SILog-MSE / SILog-RMSE, masked L1, mean-abs-rel, plain MSE/L1.

All losses are pure functions of (pred, gt[, valid_mask]) returning a
scalar; masking uses multiply-by-mask (never boolean indexing) so shapes
stay static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["get_loss", "silog_loss", "silog_mse_loss", "silog_rmse_loss",
           "l1_loss_with_mask", "mean_abs_rel_loss", "mse_loss", "l1_loss",
           "masked_mean"]

_EPS = 1e-7


def masked_mean(x, mask=None, axis=(-1, -2)):
    if mask is None:
        return jnp.mean(x, axis=axis)
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / jnp.maximum(jnp.sum(m, axis=axis), 1.0)


def silog_loss(pred, gt, valid_mask=None, *, beta: float = 0.15):
    """10*sqrt(var(g) + beta*mean(g)^2), g = log(pred+eps)-log(gt+eps).

    The reference version (`loss.py:127-139`) has no mask argument — the
    trainer indexes pred/gt by the strategy mask first. We accept an
    optional mask and compute var/mean over masked elements, which is the
    jit-stable equivalent of that boolean indexing.
    """
    g = jnp.log(pred + _EPS) - jnp.log(gt + _EPS)
    if valid_mask is None:
        mean = jnp.mean(g)
        # torch.var default is UNBIASED (n-1) — pinned by
        # tests/test_reference_protocol_golden.py against the real loss.py
        var = jnp.var(g, ddof=1)
    else:
        m = valid_mask.astype(g.dtype)
        n = jnp.maximum(jnp.sum(m), 1.0)
        mean = jnp.sum(g * m) / n
        var = jnp.sum(jnp.square(g - mean) * m) / jnp.maximum(n - 1.0, 1.0)
    return 10.0 * jnp.sqrt(var + beta * jnp.square(mean))


def _masked_log_diff_terms(pred, gt, valid_mask, log_pred: bool):
    logp = pred if log_pred else jnp.log(jnp.clip(pred, 1e-8))
    diff = logp - jnp.log(gt)
    if valid_mask is not None:
        m = valid_mask.astype(diff.dtype)
        diff = diff * m
        n = jnp.sum(m, axis=(-1, -2))
    else:
        n = jnp.asarray(float(gt.shape[-1] * gt.shape[-2]), diff.dtype)
    first = jnp.sum(jnp.square(diff), axis=(-1, -2)) / n
    second_raw = jnp.square(jnp.sum(diff, axis=(-1, -2))) / jnp.square(n)
    return first, second_raw


def silog_mse_loss(pred, gt, valid_mask=None, *, lamb: float = 0.5,
                   log_pred: bool = True, batch_reduction: bool = True):
    first, second = _masked_log_diff_terms(pred, gt, valid_mask, log_pred)
    loss = first - lamb * second
    return jnp.mean(loss) if batch_reduction else loss


def silog_rmse_loss(pred, gt, valid_mask=None, *, lamb: float = 0.5,
                    alpha: float = 1.0, log_pred: bool = True):
    first, second = _masked_log_diff_terms(pred, gt, valid_mask, log_pred)
    return jnp.mean(jnp.sqrt(first - lamb * second)) * alpha


def l1_loss_with_mask(pred, gt, valid_mask=None, *, batch_reduction: bool = False):
    diff = pred - gt
    if valid_mask is not None:
        m = valid_mask.astype(diff.dtype)
        diff = diff * m
        n = jnp.sum(m, axis=(-1, -2))
    else:
        n = jnp.asarray(float(gt.shape[-1] * gt.shape[-2]), diff.dtype)
    loss = jnp.sum(jnp.abs(diff)) / n
    return jnp.mean(loss) if batch_reduction else loss


def mean_abs_rel_loss(pred, gt):
    return jnp.mean(jnp.abs((pred - gt) / gt), axis=0)


def mse_loss(pred, gt, valid_mask=None):
    if valid_mask is None:
        return jnp.mean(jnp.square(pred - gt))
    return jnp.mean(masked_mean(jnp.square(pred - gt), valid_mask))


def l1_loss(pred, gt, valid_mask=None):
    if valid_mask is None:
        return jnp.mean(jnp.abs(pred - gt))
    return jnp.mean(masked_mean(jnp.abs(pred - gt), valid_mask))


_LOSSES = {
    "silog_loss": silog_loss,
    "silog_mse": silog_mse_loss,
    "silog_rmse": silog_rmse_loss,
    "l1_loss_with_mask": l1_loss_with_mask,
    "mean_abs_rel": mean_abs_rel_loss,
    "mse_loss": mse_loss,
    "l1_loss": l1_loss,
}


def get_loss(name: str, **kwargs):
    """Loss registry (reference `loss.py:7-25`). kwargs are bound."""
    if name not in _LOSSES:
        raise ValueError(f"unknown loss {name!r}; available: {sorted(_LOSSES)}")
    fn = _LOSSES[name]
    if not kwargs:
        return fn
    import functools
    return functools.partial(fn, **kwargs)
