"""CLI applications (console entry points when pip-installed).

`train` / `evaluate` / `preprocess` mirror the reference's top-level
`train.py` / `eval.py` / `preprocess.py` scripts; the repo keeps root-level
shims with those exact names for command-line parity.
"""
