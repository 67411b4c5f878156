"""Driver benchmark: KVAE train throughput on real hardware.

Prints one JSON line per benched config, HEADLINE FIRST — each line is
emitted (and flushed) as soon as its config finishes, so a harness-side
timeout can only truncate the tail, never lose the headline metric:
  {"metric": "train_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": N / REFERENCE_STEPS_PER_SEC, ...}
  {"metric": "skvae_train_steps_per_sec", ...}
  {"metric": "scaling_t100_ms_per_step", ...}

Configs:
  1. headline — base KVAE (LSTM-alpha, K=3, a=2, z=4, T=20, bs=32;
     BASELINE.json config 2).
  2. skvae — switching dynamics, same shapes (BASELINE.json config 3).
  3. scaling — T=100, B=128, z=8, switching (BASELINE.json config 5 shapes;
     guards the PARITY.md scaling-step number).

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
constants below were measured by running the reference PyTorch train step
(forward + loss + backward + clip + Adam, identical config/batch) on this
container's CPU — the reference's only supported non-CUDA device class here
(it shipped on CPU/MPS laptops); tools/bench_reference.py reproduces the
measurement. Headline (lstm): 2.625 steps/s. SKVAE (switching): a clean
same-session re-measurement (2026-08-20, idle host) timed the two reference
dynamics modes within 1% of each other (468.6 vs 464.7 ms/step), so the
SKVAE constant is the committed lstm baseline scaled by that measured ratio
— conservative in our favor (a HIGHER reference number lowers vs_baseline).
The BASELINE.json target is >= 10x. The scaling config has no reference
measurement (vs_baseline: null).

Each config is timed as a fused chain of train steps (jitted lax.scan), the
committed trainer's actual dispatch mode (one XLA program per epoch). This
measures device throughput; per-step Python dispatch is a host property
(~2 ms/step extra on a 1-core host) that the real trainer does not pay.
"""
import json
import sys
import time

REFERENCE_STEPS_PER_SEC = 2.625  # measured: /root/reference train step, CPU, bs=32 T=20
REFERENCE_SKVAE_STEPS_PER_SEC = 2.647  # 2.625 x (468.6/464.7), see module docstring


def _chain_flops(chain, state, x):
    """Optimized-HLO FLOP count per step of the compiled chain (XLA cost
    analysis); None if the backend doesn't expose it. The cost model counts
    a `while`-lowered scan body ONCE (verified: chain flops == the round-1
    single-step lowering's flops), so this is per-step as-is."""
    try:
        ca = chain.lower(state, x, "all").compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def bench_config(cfg, tcfg, x, chain_len, windows):
    """Median-window steps/s of a fused chain of train steps — a jitted
    `lax.scan` of `chain_len` steps, exactly how the committed trainer
    dispatches work (one XLA program per epoch, train/state.py epoch_run).
    One dispatch + one hard value-fetch sync per window, so the number
    measures device throughput, not the host's per-step Python dispatch rate
    (which varies with core count and added ~2 ms/step on a 1-core host)."""
    from functools import partial

    import jax

    from kvae_tpu.train.state import create_train_state, make_raw_train_step

    model, state, tx = create_train_state(cfg, tcfg, x)
    raw = make_raw_train_step(model, cfg, tcfg, tx)

    @partial(jax.jit, static_argnames=("phase",))
    def chain(state, x, phase):
        def body(st, _):
            st, metrics = raw(st, x, phase)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, None, length=chain_len)
        return st, losses[-1]

    t0 = time.perf_counter()
    for _ in range(2):
        state, last_loss = chain(state, x, "all")
    loss = float(last_loss)
    compile_s = time.perf_counter() - t0
    # after warmup so the cost-analysis lowering hits the compilation cache
    flops = _chain_flops(chain, state, x)

    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        state, last_loss = chain(state, x, "all")
        float(last_loss)  # hard sync
        rates.append(chain_len / (time.perf_counter() - t0))
    steps_per_sec = sorted(rates)[len(rates) // 2]
    return steps_per_sec, compile_s, loss, flops


def _throughput_extras(sps, flops):
    """Achieved model TFLOP/s from the XLA cost analysis (absolute hardware
    utilization evidence; peak-relative MFU is deliberately not claimed — the
    step mixes f32 KF numerics with bf16 convs, so no single peak applies)."""
    if flops is None:
        return {}
    return {"tflops_per_sec_achieved": round(flops * sps / 1e12, 3)}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from kvae_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from kvae_tpu.config import KVAEConfig, TrainingConfig

    n_chips = jax.local_device_count()
    rng = np.random.default_rng(0)

    def data(b, t):
        return jnp.asarray(rng.uniform(size=(b, t, 1, 32, 32)) > 0.5, jnp.float32)

    def emit(line):
        print(json.dumps(line), flush=True)

    # 1. headline
    cfg = KVAEConfig(dynamics_model="lstm", num_modes=3, a_dim=2, z_dim=4,
                     out_distr="bernoulli", filter_impl="auto")
    tcfg = TrainingConfig(batch_size=32, T=20)
    sps, compile_s, loss, flops = bench_config(cfg, tcfg, data(32, 20), 200, 5)
    print(f"headline: compile+warmup={compile_s:.1f}s loss={loss:.3f} "
          f"{sps:.2f} steps/s on {jax.devices()[0]}", file=sys.stderr)
    emit({
        "metric": "train_steps_per_sec", "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / REFERENCE_STEPS_PER_SEC, 2),
        "ms_per_step": round(1000.0 / sps, 3),
        "steps_per_sec_per_chip": round(sps / n_chips, 3),
        **_throughput_extras(sps, flops),
    })

    # 2. SKVAE (switching dynamics), same shapes
    cfg = KVAEConfig(dynamics_model="switching", num_modes=3, a_dim=2, z_dim=4,
                     out_distr="bernoulli", filter_impl="auto")
    tcfg = TrainingConfig(batch_size=32, T=20)
    sps, compile_s, loss, flops = bench_config(cfg, tcfg, data(32, 20), 200, 3)
    print(f"skvae: compile+warmup={compile_s:.1f}s loss={loss:.3f} "
          f"{sps:.2f} steps/s", file=sys.stderr)
    emit({
        "metric": "skvae_train_steps_per_sec", "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / REFERENCE_SKVAE_STEPS_PER_SEC, 2),
        "ms_per_step": round(1000.0 / sps, 3),
        "steps_per_sec_per_chip": round(sps / n_chips, 3),
        **_throughput_extras(sps, flops),
    })

    # 3. scaling config: T=100, B=128, z=8 (configs/scaling_t100.yaml shapes).
    # bfloat16 conv/MLP path: 13% faster in this throughput-bound regime
    # (22.3 vs 25.6 ms/step, PARITY.md); KF numerics stay float32.
    cfg = KVAEConfig(dynamics_model="switching", num_modes=3, a_dim=4, z_dim=8,
                     out_distr="bernoulli", filter_impl="auto",
                     compute_dtype="bfloat16")
    tcfg = TrainingConfig(batch_size=128, T=100)
    sps, compile_s, loss, flops = bench_config(cfg, tcfg, data(128, 100), 50, 3)
    print(f"scaling_t100: compile+warmup={compile_s:.1f}s loss={loss:.3f} "
          f"{1000.0 / sps:.2f} ms/step", file=sys.stderr)
    emit({
        "metric": "scaling_t100_ms_per_step", "value": round(1000.0 / sps, 3),
        "unit": "ms/step", "vs_baseline": None,
        "steps_per_sec": round(sps, 3),
        "steps_per_sec_per_chip": round(sps / n_chips, 3),
        **_throughput_extras(sps, flops),
    })


if __name__ == "__main__":
    main()
