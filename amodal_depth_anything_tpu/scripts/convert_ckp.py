"""Checkpoint surgery utilities (reference `src/scripts/convert_ckp.py:1-7`
strips a DAV2 ckpt to backbone-only keys; here we also convert torch
checkpoints to Orbax pytrees for native loading).

    # strip a torch DAV2 checkpoint to backbone-only keys
    python -m amodal_depth_anything_tpu.scripts.convert_ckp strip \
        --input ckpt.pth --output backbone.pth

    # convert a torch checkpoint to an Orbax pytree directory
    python -m amodal_depth_anything_tpu.scripts.convert_ckp to_orbax \
        --input model.safetensors --output ckpt_dir/
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["strip", "to_orbax"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    from ..convert.torch_to_jax import (convert_dav2, infer_dav2_config,
                                        load_state_dict)

    if args.command == "strip":
        import torch
        sd = torch.load(args.input, map_location="cpu", weights_only=True)
        stripped = {k.replace("pretrained.", "", 1): v for k, v in sd.items()
                    if k.startswith("pretrained.")}
        torch.save(stripped, args.output)
        print(f"wrote {len(stripped)} backbone tensors to {args.output}")
        return

    sd = load_state_dict(args.input)
    cfg = infer_dav2_config(sd)
    params = convert_dav2(sd, cfg)
    import orbax.checkpoint as ocp
    ocp.PyTreeCheckpointer().save(os.path.abspath(args.output),
                                  {"params": params}, force=True)
    print(f"wrote Orbax checkpoint ({cfg.encoder}, raw={cfg.raw}) to "
          f"{args.output}")


if __name__ == "__main__":
    main()
