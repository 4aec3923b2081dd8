"""RMBG converter round-trip incl. BatchNorm folding correctness, via the
package emitter (emit_rmbg_sd is convert_rmbg's inverse)."""

import numpy as np

import jax

from amodal_depth_anything_tpu.convert.emit_torch import emit_rmbg_sd
from amodal_depth_anything_tpu.convert.rmbg_convert import convert_rmbg
from amodal_depth_anything_tpu.models.rmbg import RMBGConfig, init_rmbg


def _tree_paths(tree):
    return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _cfg():
    return RMBGConfig(width=8, stage_mid=(4, 4, 4, 8, 8, 8),
                      stage_out=(8, 8, 16, 16, 16, 16),
                      dec_mid=(4, 4, 4, 8, 8))


def test_rmbg_roundtrip_identity_stats():
    """mean=0/var=1-eps emission folds back bit-close to the source
    bn_scale/bn_bias (the emitter's default, used by --rehearse)."""
    cfg = _cfg()
    params = jax.tree.map(np.asarray,
                          jax.jit(lambda k: init_rmbg(k, cfg))(
                              jax.random.PRNGKey(0)))
    converted = convert_rmbg(emit_rmbg_sd(params, cfg), cfg)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_rmbg_roundtrip_random_bn_stats():
    """Random (gamma, beta, mean, var) consistent with the folded params:
    the converter's eval-mode BN fold must recover them — the actual
    briaai/RMBG-1.4 checkpoint shape of the problem."""
    cfg = _cfg()
    params = jax.tree.map(np.asarray,
                          jax.jit(lambda k: init_rmbg(k, cfg))(
                              jax.random.PRNGKey(0)))
    sd = emit_rmbg_sd(params, cfg, bn_stats=np.random.default_rng(1))
    # sanity: live stats really are emitted (not the identity shortcut)
    assert any("running_mean" in k and np.abs(v).max() > 0
               for k, v in sd.items())
    converted = convert_rmbg(sd, cfg)
    a, b = _tree_paths(params), _tree_paths(converted)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)
