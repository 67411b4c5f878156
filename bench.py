"""Headline benchmark: KVAE train steps/sec on the base config
(K=3, a_dim=2, z_dim=4, T=20, batch 32 — BASELINE.json config 2).

Prints ONE JSON line:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N / REFERENCE_STEPS_PER_SEC}

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
constant below was measured by running the reference PyTorch train step
(forward + loss + backward + clip + Adam, identical config/batch) on this
container's CPU — the reference's only supported non-CUDA device class here
(it shipped on CPU/MPS laptops): 2.625 steps/s. The BASELINE.json target is
>= 10x that.
"""
import json
import sys
import time

REFERENCE_STEPS_PER_SEC = 2.625  # measured: /root/reference train step, CPU, bs=32 T=20

WARMUP_STEPS = 10
TIMED_STEPS = 500   # per window
WINDOWS = 5         # report the median window (dispatch-stream jitter)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kvae_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from kvae_tpu.config import KVAEConfig, TrainingConfig
    from kvae_tpu.train.state import create_train_state, make_train_step

    cfg = KVAEConfig(
        dynamics_model="lstm", num_modes=3, a_dim=2, z_dim=4,
        out_distr="bernoulli", filter_impl="auto",
    )
    tcfg = TrainingConfig(batch_size=32, T=20)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(32, 20, 1, 32, 32)) > 0.5, jnp.float32)

    model, state, tx = create_train_state(cfg, tcfg, x)
    train_step = make_train_step(model, cfg, tcfg, tx)

    t0 = time.perf_counter()
    for _ in range(WARMUP_STEPS):
        state, metrics = train_step(state, x, "all")
    float(metrics["loss"])
    compile_and_warmup = time.perf_counter() - t0

    rates = []
    for _ in range(WINDOWS):
        t0 = time.perf_counter()
        for _ in range(TIMED_STEPS):
            state, metrics = train_step(state, x, "all")
        float(metrics["loss"])  # hard sync
        rates.append(TIMED_STEPS / (time.perf_counter() - t0))

    steps_per_sec = sorted(rates)[len(rates) // 2]
    print(
        f"device={jax.devices()[0]} compile+warmup={compile_and_warmup:.1f}s "
        f"loss={float(metrics['loss']):.3f} {steps_per_sec:.2f} steps/s",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "value": round(steps_per_sec, 3),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / REFERENCE_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
