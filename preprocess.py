#!/usr/bin/env python
"""Repo-root shim for reference CLI parity (`python preprocess.py ...`).

The implementation lives in `nsff_pl_tpu.apps.preprocess` (installed as
the `nsff-preprocess` console script).
"""
from nsff_pl_tpu.apps.preprocess import (  # noqa: F401
    cli, generate_depth, generate_flow, generate_masks, get_opts, main,
    resize_frames, run_colmap)

if __name__ == "__main__":
    cli()
