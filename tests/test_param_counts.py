"""Architecture-fidelity: parameter counts vs the published model sizes.

The reference's own UNet smoke test checks the SD param count
(`openaimodel.py:879-894`); we extend the idea to every family using
`jax.eval_shape` (no memory allocated). Counts must land within 2% of the
known sizes — a topology error (wrong hidden dim, missing block, bad
channel mult) moves these numbers far more than that."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from amodal_depth_anything_tpu.models.amodal_dav2 import (DAV2Config,
                                                          init_amodal_dav2)
from amodal_depth_anything_tpu.models.sam import SAMConfig, init_sam
from amodal_depth_anything_tpu.models.unet_ldm import UNetConfig, init_unet
from amodal_depth_anything_tpu.models.vae import SD_VAE, init_vae


def _count(init_fn):
    tree = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(tree))


CASES = [
    # (name, init, expected params)
    ("sd_vae", lambda k: init_vae(k, SD_VAE), 83.65e6),
    # SD-1.5 UNet is 859M at context 768; DepthFM's 1024-dim cross-attn
    # k/v projections add ~7M
    ("depthfm_unet",
     lambda k: init_unet(k, UNetConfig(in_channels=8, context_dim=1024)),
     866e6),
    ("pix2gestalt_unet",
     lambda k: init_unet(k, UNetConfig(in_channels=8, context_dim=768,
                                       use_linear_in_transformer=False)),
     859e6),
    # DAV2-L 335M + guidance patch embed + amodal input_projection convs
    ("amodal_dav2_vitl",
     lambda k: init_amodal_dav2(k, DAV2Config(encoder="vitl")), 357e6),
    ("raw_dav2_vitg",
     lambda k: init_amodal_dav2(
         k, DAV2Config(encoder="vitg", guide_type="none", raw=True)),
     1.258e9),
    ("sam_vit_h", lambda k: init_sam(k, SAMConfig()), 641e6),
]


@pytest.mark.parametrize("name,init,expected", CASES,
                         ids=[c[0] for c in CASES])
def test_param_count(name, init, expected):
    n = _count(init)
    assert abs(n - expected) / expected < 0.02, \
        f"{name}: {n / 1e6:.1f}M vs expected {expected / 1e6:.1f}M"
