"""CI entry for the training-gradient golden (VERDICT r4 #6): the f64
reference-equation loss + finite-difference gradients vs the jitted
training loss/grads, quick shapes. Full recipe shapes run on TPU via
`python tools/golden_train_grads.py` (results in docs/ROADMAP.md)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_golden_train_grads_quick(tmp_path):
    from tools.golden_train_grads import run

    # raises SystemExit on any loss-term or gradient mismatch
    run(quick=True, ckpt=str(tmp_path / "golden_train.ckpt"))
