"""Measure the REFERENCE implementation's train-step throughput on CPU.

Produces the `REFERENCE_*_STEPS_PER_SEC` constants in bench.py: the full
reference training step (forward + compute_loss + backward + grad-clip +
Adam step, reference kvae/train/train.py:44-58) on this container's CPU —
the reference's only supported non-CUDA device class here (it shipped on
CPU/MPS laptops). One measurement per dynamics mode:

  lstm       — base KVAE  (dynamics_model="lstm",      K=3, a=2, z=4)
  switching  — SKVAE      (dynamics_model="switching", K=3, a=2, z=4)

both at bs=32, T=20 (the headline shapes in BASELINE.json).

Run: python tools/bench_reference.py [--steps N]
"""
import argparse
import importlib
import sys
import time
from pathlib import Path

REFERENCE = Path("/root/reference")


def measure(dynamics_model: str, steps: int) -> float:
    import torch

    from kvae.model.model import KVAE
    from kvae.utils.config import KVAEConfig

    torch.manual_seed(0)
    cfg = KVAEConfig(dynamics_model=dynamics_model)
    model = KVAE(cfg)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    x = torch.rand(32, 20, 1, 32, 32)
    mask = torch.ones(32, 20)

    def step():
        model.kalman_filter.dyn_params.reset_state()
        opt.zero_grad(set_to_none=True)
        outputs = model(x, mask=mask)
        losses = model.compute_loss(x, outputs, mask=mask)
        losses["loss"].backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    return steps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    sys.path.insert(0, str(REFERENCE))
    # The reference package is import-broken as shipped (kvae/vae/losses.py:4
    # imports kvae.vae.config, which does not exist); alias it as any
    # reference user must.
    sys.modules["kvae.vae.config"] = importlib.import_module("kvae.utils.config")

    for mode in ("lstm", "switching"):
        sps = measure(mode, args.steps)
        print(f"{mode}: {sps:.3f} steps/s ({1000.0 / sps:.1f} ms/step)")


if __name__ == "__main__":
    main()
