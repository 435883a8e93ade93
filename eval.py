#!/usr/bin/env python
"""Repo-root shim for reference CLI parity (`python eval.py ...`).

The implementation lives in `nsff_pl_tpu.apps.evaluate` (installed as the
`nsff-eval` console script).
"""
from nsff_pl_tpu.apps.evaluate import (  # noqa: F401
    cli, get_opts, load_params, main, save_depth_img)

if __name__ == "__main__":
    cli()
