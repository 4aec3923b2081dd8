"""Tests for multi-res noise, dataset census, depth normalizers."""

import numpy as np

import jax
import jax.numpy as jnp

from amodal_depth_anything_tpu.utils.depth_transform import (
    SAMNormalizer, ScaleShiftDepthNormalizer, get_depth_normalizer)
from amodal_depth_anything_tpu.utils.multi_res_noise import multi_res_noise_like
from amodal_depth_anything_tpu.utils.stats import (dataset_census,
                                                   sample_difficulty)


def test_multi_res_noise_unit_variance(rng):
    x = jnp.zeros((2, 32, 32, 4))
    noise = multi_res_noise_like(jax.random.PRNGKey(0), x, strength=0.9)
    n = np.asarray(noise)
    assert n.shape == x.shape
    assert abs(n.std() - 1.0) < 0.05
    # correlated across scales: neighboring pixels more similar than iid
    iid = np.asarray(jax.random.normal(jax.random.PRNGKey(1), x.shape))
    corr = np.mean(n[:, :-1] * n[:, 1:])
    corr_iid = np.mean(iid[:, :-1] * iid[:, 1:])
    assert corr > corr_iid + 0.05


def test_scale_shift_normalizer(rng):
    d = jnp.asarray(rng.random((16, 16, 1), dtype=np.float32)) + 0.5
    norm = get_depth_normalizer({"type": "scale_shift_depth",
                                 "norm_min": -1.0, "norm_max": 1.0,
                                 "min_max_quantile": 0.02, "clip": True})
    assert isinstance(norm, ScaleShiftDepthNormalizer)
    out = np.asarray(norm(d))
    assert out.min() >= -1.0 and out.max() <= 1.0
    back = np.asarray(norm.scale_back(jnp.asarray(out)))
    assert back.min() >= 0.0 and back.max() <= 1.0
    assert isinstance(get_depth_normalizer({"type": "sam_depth"}),
                      SAMNormalizer)


def test_sample_difficulty_buckets():
    guide = np.zeros((32, 32)); guide[8:24, 8:24] = 1
    visible = guide.copy(); visible[:, 16:] = 0
    bucket, band, vr, orat = sample_difficulty(guide, visible)
    assert bucket == "hard" and 0.49 < vr < 0.51
    visible2 = guide.copy(); visible2[:, 20:] = 0
    assert sample_difficulty(guide, visible2)[0] == "mid"


class _DS:
    def __init__(self):
        g = np.zeros((16, 16, 1)); g[4:12, 4:12] = 1
        v = g.copy(); v[:, 8:] = 0
        self.s = {"guide": g, "visible_mask": v}

    def __len__(self):
        return 3

    def __getitem__(self, i):
        return self.s


def test_dataset_census():
    census = dataset_census(_DS())
    assert sum(census.values()) == 3
    assert all("/" in k for k in census)
