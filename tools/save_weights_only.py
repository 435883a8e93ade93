#!/usr/bin/env python
"""Strip a training checkpoint to bare model weights.

Equivalent of the reference `utils/save_weights_only.py:4-15` for both
checkpoint flavors:
  - orbax training checkpoint (ckpts/<exp>/step_N) -> params-only orbax dir
  - reference Lightning .ckpt -> params-only orbax dir (via the importer)

    python tools/save_weights_only.py --ckpt_path ckpts/exp/step_100 \
        --out weights/exp [--encode_a --encode_t ...model flags...]
"""
import argparse
import sys

sys.path.insert(0, ".")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--out", type=str, required=True)
    # model-shape flags needed to build the abstract pytree for orbax
    parser.add_argument("--use_viewdir", default=False, action="store_true")
    parser.add_argument("--N_importance", type=int, default=0)
    parser.add_argument("--encode_a", default=False, action="store_true")
    parser.add_argument("--N_a", type=int, default=48)
    parser.add_argument("--encode_t", default=False, action="store_true")
    parser.add_argument("--N_tau", type=int, default=48)
    parser.add_argument("--start_end", nargs="+", type=int, default=[0, 30])
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nsff_pl_tpu.config import NSFFConfig
    from nsff_pl_tpu.training import checkpoint as ckpt_lib
    from nsff_pl_tpu.training.trainer import build_params

    cfg = NSFFConfig(
        start_end=tuple(args.start_end), use_viewdir=args.use_viewdir,
        N_importance=args.N_importance, encode_a=args.encode_a,
        N_a=args.N_a, encode_t=args.encode_t, N_tau=args.N_tau)

    if args.ckpt_path.endswith(".ckpt"):
        params = ckpt_lib.import_pl_checkpoint(args.ckpt_path)
    else:
        init = build_params(cfg, jax.random.PRNGKey(0))
        from nsff_pl_tpu.training.optim import make_optimizer
        from nsff_pl_tpu.training.step import TrainState

        tx = make_optimizer(cfg, 1)
        abstract = {"state": TrainState(init, tx.init(init),
                                        jnp.zeros((), jnp.int32)),
                    "sampling_weights": np.zeros((1,), np.float32)}
        params = ckpt_lib.restore_checkpoint(args.ckpt_path,
                                             abstract)["state"].params

    import os

    ckpt_lib._checkpointer().save(os.path.abspath(args.out),
                                  {"params": params}, force=True)
    ckpt_lib._checkpointer().wait_until_finished()
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"saved params-only checkpoint ({n:,} params) to {args.out}")


if __name__ == "__main__":
    main()
