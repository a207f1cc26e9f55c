#!/usr/bin/env python
"""One-time conversion of released torch checkpoints to torch-free npz.

    python scripts/convert_checkpoint.py --kind rdm \\
        --ckpt models/rdm/imagenet/model.ckpt \\
        --config models/rdm/imagenet/config.yaml --out models/rdm/imagenet/

Kinds: rdm (model + first stage), rarm (transformer + first stage),
autoencoder (standalone first stage), clip (OpenAI ViT checkpoint).
Outputs <out>/params.npz (+ first_stage_params.npz for rdm/rarm);
pipelines prefer these over model.ckpt when present.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kind", choices=["rdm", "rarm", "autoencoder", "clip"],
                   required=True)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--config", default=None,
                   help="config.yaml (reference format); required for "
                        "rdm/rarm/autoencoder")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--no_ema", action="store_true",
                   help="rdm: keep raw weights instead of the EMA swap")
    opt = p.parse_args()
    os.makedirs(opt.out, exist_ok=True)

    from rdm_tpu.utils.params_io import save_params_npz
    from rdm_tpu.utils.torch_convert import load_torch_state_dict

    sd = load_torch_state_dict(opt.ckpt)

    if opt.kind == "clip":
        from rdm_tpu.utils.torch_convert import convert_clip

        params, cfg = convert_clip(sd)
        save_params_npz(os.path.join(opt.out, "clip_params.npz"), params)
        print(f"CLIP {cfg.vision_layers}L/{cfg.vision_width}w -> "
              f"{opt.out}/clip_params.npz")
        return

    from rdm_tpu.config import (
        first_stage_config_from_yaml,
        load_config,
        model_config_from_yaml,
    )

    assert opt.config, "--config required"
    cfg_yaml = load_config([opt.config])

    if opt.kind == "autoencoder":
        from rdm_tpu.utils.torch_convert import convert_autoencoder

        fs_cfg = first_stage_config_from_yaml(cfg_yaml)
        params = convert_autoencoder(sd, fs_cfg)
        save_params_npz(os.path.join(opt.out, "params.npz"), params)
    elif opt.kind == "rdm":
        from rdm_tpu.utils.torch_convert import convert_rdm

        model_cfg = model_config_from_yaml(cfg_yaml)
        fs_cfg = first_stage_config_from_yaml(cfg_yaml)
        params, fs_params = convert_rdm(sd, model_cfg.unet, fs_cfg,
                                        use_ema=not opt.no_ema)
        save_params_npz(os.path.join(opt.out, "params.npz"), params)
        save_params_npz(os.path.join(opt.out, "first_stage_params.npz"),
                        fs_params)
    else:  # rarm
        from rdm_tpu.utils.torch_convert import convert_rarm

        model_cfg = model_config_from_yaml(cfg_yaml)
        fs_cfg = first_stage_config_from_yaml(cfg_yaml)
        params, fs_params = convert_rarm(sd, model_cfg, fs_cfg)
        save_params_npz(os.path.join(opt.out, "params.npz"), params)
        save_params_npz(os.path.join(opt.out, "first_stage_params.npz"),
                        fs_params)
    print(f"converted {opt.kind} checkpoint -> {opt.out}")


if __name__ == "__main__":
    main()
