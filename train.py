#!/usr/bin/env python
"""Repo-root shim for reference CLI parity (`python train.py ...`).

The implementation lives in `nsff_pl_tpu.apps.train` (installed as the
`nsff-train` console script).
"""
from nsff_pl_tpu.apps.train import (  # noqa: F401
    backup_files, cli, main)
from nsff_pl_tpu.config import get_opts  # noqa: F401

if __name__ == "__main__":
    cli()
