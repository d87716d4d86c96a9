"""Convert released PyTorch checkpoints into this framework's orbax format.

One command per reference asset family (SURVEY.md "weight conversion" hard
part):

  python -m diffnorm_tpu.cli.convert_checkpoint --type vae \
      --input speech_vae.pt --output ckpts/vae
  python -m diffnorm_tpu.cli.convert_checkpoint --type diffusion \
      --input diff_discrete.pt --output ckpts/diffusion
  python -m diffnorm_tpu.cli.convert_checkpoint --type nar \
      --input nar_s2ut.pt --output ckpts/nar
  python -m diffnorm_tpu.cli.convert_checkpoint --type hifigan \
      --input g_00500000 --vocoder-cfg config.json --output ckpts/vocoder
  python -m diffnorm_tpu.cli.convert_checkpoint --type hubert \
      --input mhubert_base.pt --hubert-layers 12 --output ckpts/hubert

The output directory restores with train/checkpoint.load_checkpoint_params
and plugs straight into cli/generate.py --path / cli/diff_norm_synthesis.py
/ the vocoder and feature-dump CLIs.
"""

from __future__ import annotations

import argparse
import json
import logging
import os

logger = logging.getLogger("diffnorm_tpu.convert_checkpoint")


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s | %(levelname)s | %(message)s")
    p = argparse.ArgumentParser()
    p.add_argument("--type", required=True,
                   choices=["vae", "diffusion", "nar", "hifigan", "hubert",
                            "hubert_ctc", "gan_discriminators"])
    p.add_argument("--input", required=True, help="torch checkpoint path")
    p.add_argument("--output", required=True,
                   help="orbax checkpoint directory to create")
    p.add_argument("--vocoder-cfg",
                   help="HiFi-GAN config.json (required for --type hifigan)")
    p.add_argument("--hubert-layers", type=int, default=None,
                   help="transformer layer count for hubert/hubert_ctc "
                        "(default: inferred from the checkpoint keys)")
    p.add_argument("--no-strict", dest="strict", action="store_false",
                   help="skip the key-inventory audit (conversion proceeds "
                        "even when checkpoint weights go unconsumed)")
    args = p.parse_args(argv)

    from diffnorm_tpu.utils import convert_weights as cw

    # Load the state dict ONCE; both the conversion and the strict
    # key-inventory audit below consume the same `sd`.
    sd = None
    if args.type == "hifigan":
        import torch

        ckpt = torch.load(args.input, map_location="cpu",
                          weights_only=False)
        sd = ckpt.get("generator", ckpt.get("model", ckpt))
    elif args.type != "gan_discriminators":
        sd = cw._load_torch_state(args.input)

    if args.type == "vae":
        variables = {"params": cw.convert_vae_state(sd)}
    elif args.type == "diffusion":
        variables = {"params": cw.convert_diffusion_state(sd)}
    elif args.type == "nar":
        variables = cw.convert_nar_state(sd)
    elif args.type == "hubert_ctc":
        variables = cw.convert_hubert_ctc_checkpoint(
            args.input,
            layers=args.hubert_layers or cw._torch_layer_count(sd))
    elif args.type == "hifigan":
        assert args.vocoder_cfg, "--vocoder-cfg required for hifigan"
        with open(args.vocoder_cfg) as f:
            cfg = json.load(f)
        variables = cw.convert_hifigan_state(sd, cfg)
    elif args.type == "gan_discriminators":
        # hifigan fine-tune `do_*` checkpoint layout:
        # {"mpd": state_dict, "msd": state_dict, ...} — resumes a vocoder
        # fine-tune with the reference's trained discriminators
        # (research/TranSpeech/hifigan/models.py:128-249)
        import torch

        ckpt = torch.load(args.input, map_location="cpu",
                          weights_only=False)
        variables = cw.convert_gan_discriminators(ckpt["mpd"], ckpt["msd"])
    else:
        variables = cw.convert_hubert_state(
            sd, layers=args.hubert_layers or cw._torch_layer_count(sd))

    # --strict (default): audit the conversion against the checkpoint's key
    # inventory — every learned element must land in the converted tree,
    # with the family's documented pretrain-only heads excepted. Released
    # checkpoints carry key quirks (optimizer/ema envelopes, extra heads);
    # an unconsumed weight fails LOUD here instead of silently degrading.
    if args.strict and args.type != "gan_discriminators":
        expected = cw.EXPECTED_UNCONSUMED.get(args.type, ())
        cw.conversion_inventory(sd, variables, expected_unconsumed=expected)
        logger.info("key inventory balanced (%s)", args.type)

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.output)
    if os.path.exists(out):
        raise SystemExit(f"refusing to overwrite existing {out}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(out, variables)
    ckptr.wait_until_finished()
    n = sum(1 for _ in __import__("jax").tree_util.tree_leaves(variables))
    logger.info("wrote %d arrays -> %s", n, out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
