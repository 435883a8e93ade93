"""Training CLI flags — flag-for-flag parity with the reference `opt.py:3-114`.

Thin shim over `nsff_pl_tpu.config` (the framework's single config surface).
"""
from nsff_pl_tpu.config import get_opts  # noqa: F401
