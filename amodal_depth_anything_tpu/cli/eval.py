"""Evaluation CLI (reference `eval.py:43-306` contract).

    python -m amodal_depth_anything_tpu.cli.eval \
        --config configs/train_discriminative_vitl.yaml \
        --trained_checkpoint work_dir/ckpt_dir_or_safetensors \
        --base_data_dir /data/sam --output_dir work_dir/eval

Loads the trained model (an Orbax checkpoint directory saved by our
trainer, or a torch safetensors/pth via the converter), runs
`validate_single_dataset(eval=True)` over each configured val split, and
writes per-bucket metric tables to `evaluation/eval.txt`.
"""

from __future__ import annotations

import argparse
import logging
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate amodal depth models (TPU)")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--trained_checkpoint", type=str, required=True)
    p.add_argument("--base_data_dir", type=str, default=None)
    p.add_argument("--output_dir", type=str, default="work_dir/eval")
    return p


def load_params_any(path: str, model):
    """Load params from an Orbax dir, a torch .pth, or safetensors."""
    if os.path.isdir(path) and not os.path.exists(
            os.path.join(path, "model.safetensors")):
        import orbax.checkpoint as ocp
        import jax
        ckptr = ocp.PyTreeCheckpointer()
        template = model.init(jax.random.PRNGKey(0))
        restored = ckptr.restore(os.path.abspath(path))
        tree = restored.get("params", restored)
        return jax.tree.map(lambda t, r: r.astype(t.dtype) if hasattr(
            r, "astype") else r, template, tree)
    from ..convert.torch_to_jax import convert_dav2, load_state_dict
    if os.path.isdir(path):
        path = os.path.join(path, "model.safetensors")
    sd = load_state_dict(path)
    return convert_dav2(sd, model.config)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from ..data import DataLoader, DatasetMode, get_dataset
    from ..models import get_model
    from ..parallel import make_mesh, shard_params
    from ..train import get_trainer_cls
    from .train import trainer_config_from_cfg
    from ..utils.config import recursive_load_config
    from ..utils.depth_transform import get_depth_normalizer
    from ..utils.logging_util import config_logging, eval_dic_to_text

    cfg = recursive_load_config(args.config)
    base_data_dir = args.base_data_dir or os.environ.get("BASE_DATA_DIR")
    if base_data_dir is None:
        raise SystemExit("--base_data_dir or $BASE_DATA_DIR required")
    out_dir = os.path.join(args.output_dir, "evaluation")
    os.makedirs(out_dir, exist_ok=True)
    config_logging(cfg.get("logging"), out_dir=args.output_dir)

    model = get_model(cfg.model.name, **cfg.model.kwargs.to_dict())
    mesh = make_mesh()
    normalizer = get_depth_normalizer(cfg.get("depth_normalization"))

    val_cfg = cfg.dataset.val
    items = val_cfg if isinstance(val_cfg, list) else [val_cfg]
    val_loaders = []
    for item in items:
        ds = get_dataset(item, base_data_dir, DatasetMode.EVAL,
                         depth_transform=normalizer)
        val_loaders.append(DataLoader(
            ds, batch_size=mesh.shape["data"], pad_last=True,
            num_workers=int(
                (cfg.get("dataloader") or {}).get("num_workers", 0) or 0)))

    tcfg = trainer_config_from_cfg(cfg, accumulation_steps=1)
    trainer_cls = get_trainer_cls(cfg.trainer.name)
    trainer = trainer_cls(tcfg, model, train_loader=None,
                          val_loaders=val_loaders, mesh=mesh,
                          out_dir_eval=out_dir)
    params = load_params_any(args.trained_checkpoint, model)
    trainer.state = trainer.state.replace(
        params=shard_params(mesh, params))

    eval_txt = os.path.join(out_dir, "eval.txt")
    with open(eval_txt, "a") as f:
        for loader in val_loaders:
            name = getattr(loader.dataset, "disp_name", "val")
            logging.info("evaluating %s", name)
            results = trainer.validate_single_dataset(loader, eval=True)
            for bucket, metrics in results.items():
                text = eval_dic_to_text(metrics, f"{name}/{bucket}")
                print(text)
                f.write(text + "\n")
    logging.info("wrote %s", eval_txt)


if __name__ == "__main__":
    main()
