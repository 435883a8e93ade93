#!/usr/bin/env python
"""Strip a training checkpoint to bare model weights.

Equivalent of the reference `utils/save_weights_only.py:4-15` for both
checkpoint flavors:
  - orbax training checkpoint (ckpts/<exp>/step_N) -> params-only orbax dir
  - reference Lightning .ckpt -> params-only orbax dir (via the importer)

    python tools/save_weights_only.py --ckpt_path ckpts/exp/step_100 \
        --out weights/exp

The orbax path restores the raw on-disk tree (no abstract pytree), so it
works for any optimizer / scene shape the checkpoint was trained with.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args(argv)

    import jax
    import numpy as np

    from nsff_pl_tpu.training import checkpoint as ckpt_lib

    if args.ckpt_path.endswith(".ckpt"):
        params = ckpt_lib.import_pl_checkpoint(args.ckpt_path)
    else:
        raw = ckpt_lib._checkpointer().restore(
            os.path.abspath(args.ckpt_path))
        params = raw["state"]["params"]

    ckpt_lib._checkpointer().save(os.path.abspath(args.out),
                                  {"params": params}, force=True)
    ckpt_lib._checkpointer().wait_until_finished()
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"saved params-only checkpoint ({n:,} params) to {args.out}")


if __name__ == "__main__":
    main()
