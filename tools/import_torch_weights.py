#!/usr/bin/env python
"""Import torch .pth weights into a vidmat orbax checkpoint
(SURVEY.md §5 checkpoint/resume: mandatory bridge for reference parity).

Usage:
  python tools/import_torch_weights.py IN.pth OUT_DIR [--trimap] [--no-recurrent]

The state_dict must follow the oracle module naming
(vidmat/models/torch_oracle.py); for a reference checkpoint with different
names, pass --map FILE with "src_key -> dst_key" lines.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pth")
    ap.add_argument("out")
    ap.add_argument("--trimap", action="store_true")
    ap.add_argument("--no-recurrent", action="store_true")
    ap.add_argument("--map", help="key remap file: 'src -> dst' per line")
    args = ap.parse_args()

    # Weight conversion is host work; never let it grab the TPU (the
    # ambient axon registration pins the platform unless overridden here).
    import jax

    jax.config.update("jax_platforms", "cpu")

    import torch

    from vidmat.config import ModelConfig
    from vidmat.models.weights import (init_params, save_checkpoint,
                                       torch_to_flax_variables)

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    if args.map:
        remap = {}
        with open(args.map) as f:
            for line in f:
                if "->" in line:
                    src, dst = (x.strip() for x in line.split("->"))
                    remap[src] = dst
        sd = {remap.get(k, k): v for k, v in sd.items()}

    cfg = ModelConfig(use_trimap=args.trimap,
                      recurrent=not args.no_recurrent)
    template = init_params(cfg)
    variables = torch_to_flax_variables(sd, template)
    save_checkpoint(args.out, variables)
    print(f"imported {len(sd)} tensors -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
