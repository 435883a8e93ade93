"""Training system: losses, metrics, optimizer/scheduler factories, the
jitted (and pjit-sharded) train step, checkpointing, and the training loop.
"""
