"""kvae_tpu — a TPU-native (JAX/XLA/Pallas) Kalman Variational Auto-Encoder framework.

A from-scratch rebuild of the capabilities of the reference PyTorch
implementation (rodrigo-paganini/kalman-vae), designed TPU-first:

- The Kalman filter / RTS smoother recursions are `lax.scan` loops (plus an
  O(log T) parallel-in-time `lax.associative_scan` variant and a fused Pallas
  kernel for the hot filter loop), not Python loops.
- The whole train step — conv VAE, dynamics-parameter networks, filter,
  smoother, ELBO, optimizer — jits into a single XLA program.
- Batch data-parallelism rides a `jax.sharding.Mesh` ('data' axis); gradient
  all-reduce is emitted by XLA over ICI.
- State is functional: params / optimizer state / RNG keys / schedule state
  are explicit pytrees (no module mutation, no global RNG).

Reference layer map: see SURVEY.md at the repo root; parity citations to the
reference live in the docstrings of each module (file:line of /root/reference).
"""

__version__ = "0.1.0"

from kvae_tpu.config import KVAEConfig, TrainingConfig  # noqa: F401
