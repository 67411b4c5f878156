"""Driver benchmark: KVAE train throughput on real hardware.

Prints one JSON line per metric, CHEAPEST AND MOST IMPORTANT FIRST, each
flushed the moment it exists — a harness-side timeout can only truncate the
tail, never lose the headline. The headline `train_steps_per_sec` record is
additionally RE-EMITTED as the very last line (drivers that keep only the
final line then hold the headline, not the scaling tail — round-3 lesson:
BENCH_r03.json's parsed field carried only the last-emitted metric).
Robustness rules learned from the tunneled backend (round 2's rc=124:
compile latency there is weather-dependent, 40-900 s for the same program,
and the persistent compile cache does not hit across processes):

  1. The FIRST emitted line needs exactly ONE remote compile: the jitted
     single train step (params init runs on the local CPU backend, then the
     state is device_put to the TPU). It lands as a provisional
     `train_steps_per_sec` measured over dispatched steps.
  2. The fused-chain refinement (the committed trainer's dispatch mode,
     train/state.py epoch_run) re-emits `train_steps_per_sec` afterwards
     (drivers keep the last line per metric).
  3. Every compile is logged to stderr with a timestamp BEFORE it starts,
     so a timeout is diagnosable from the tail.
  4. Later stages are budget-gated: once BENCH_BUDGET_S (default 540 s) is
     spent, remaining stages are skipped with a note instead of timing out
     silently. Optional XLA cost analysis is only attempted inside the
     budget (it costs an extra AOT compile; the in-process jit cache does
     not serve it and the persistent cache cannot be relied on here).

Configs:
  1. headline — base KVAE (LSTM-alpha, K=3, a=2, z=4, T=20, bs=32;
     BASELINE.json config 2).
  2. skvae — switching dynamics, same shapes (BASELINE.json config 3).
  3. scaling — T=100, B=128, z=8, switching, bfloat16 conv path
     (BASELINE.json config 5 shapes; guards the PARITY.md scaling number).

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
constants below were measured by running the reference PyTorch train step
(forward + loss + backward + clip + Adam, identical config/batch) on this
container's CPU — the reference's only supported non-CUDA device class here
(it shipped on CPU/MPS laptops); tools/bench_reference.py reproduces the
measurement. Headline (lstm): 2.625 steps/s. SKVAE (switching): the two
reference dynamics modes timed within 1% of each other, so the SKVAE
constant is the lstm baseline scaled by that measured ratio. The
BASELINE.json target is >= 10x. The scaling config has no reference
measurement (vs_baseline: null).

MFU: each line reports achieved model TFLOP/s (from XLA cost analysis,
when the budget allowed it) and percent of the chip's bf16 peak. The
percent is a LOWER BOUND on how well the chip is used: the KF numerics
deliberately run in float32 on the VPU (tiny 4x4 systems, not MXU work),
so bf16-peak MFU undercounts a workload that is by design not matmul-bound.
"""
import json
import os
import sys
import time

REFERENCE_STEPS_PER_SEC = 2.625  # measured: /root/reference train step, CPU, bs=32 T=20
REFERENCE_SKVAE_STEPS_PER_SEC = 2.647  # 2.625 x (468.6/464.7), see docstring

# bf16 peak TFLOP/s per chip by device kind (public spec sheets).
_PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,       # v5p
    "TPU v6 lite": 918.0,  # v6e / Trillium
}

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "540"))


def log(msg):
    print(f"[bench {time.perf_counter() - T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def remaining():
    return BUDGET_S - (time.perf_counter() - T0)


def emit(line):
    print(json.dumps(line), flush=True)


def peak_tflops():
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in _PEAK_BF16_TFLOPS.items():
        if kind.startswith(k):
            return v
    return None


def make_state(cfg, tcfg, x_np):
    """Params/opt-state init on the LOCAL CPU backend (fast local compile),
    then device_put to the accelerator — avoids paying one remote compile
    per config just to initialize. The CPU twin inits with the scan engine
    (Pallas kernels don't lower on CPU); the parameter tree is engine-
    independent, so the real model consumes it unchanged. Falls back to
    accelerator init if anything about the CPU path fails."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from kvae_tpu.models.kvae import KVAE
    from kvae_tpu.train.state import create_train_state

    accel = jax.devices()[0]
    try:
        cpu = jax.devices("cpu")[0]
        init_cfg = dataclasses.replace(cfg, filter_impl="scan")
        with jax.default_device(cpu):
            _, state, tx = create_train_state(
                init_cfg, tcfg, jnp.asarray(x_np)
            )
        model = KVAE(cfg)
        state = jax.device_put(state, accel)
    except Exception as e:
        log(f"CPU-backend init failed ({type(e).__name__}: {e}); "
            "initializing on the accelerator")
        model, state, tx = create_train_state(cfg, tcfg, jnp.asarray(x_np))
    x = jax.device_put(jnp.asarray(x_np), accel)
    return model, state, tx, x


def flops_per_step(step_fn, *args):
    """Per-step optimized-HLO FLOPs via an AOT lowering (costs a compile;
    call only inside the budget). Verified: a while-lowered scan body is
    counted once, so chain FLOPs == single-step FLOPs."""
    try:
        ca = step_fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception as e:
        log(f"cost analysis unavailable: {type(e).__name__}")
        return None


def throughput_extras(sps, flops, peak):
    if flops is None:
        return {}
    tflops = flops * sps / 1e12
    out = {"tflops_per_sec_achieved": round(tflops, 3)}
    if peak:
        out["mfu_pct_of_bf16_peak"] = round(100.0 * tflops / peak, 3)
    return out


def bench_single_step(model, cfg, tcfg, tx, state, x, iters=30):
    """Dispatched-loop steps/s of the plainly-jitted train step. One remote
    compile; on a slow host this under-reads device throughput by the
    per-step Python dispatch cost (~2 ms on this 1-core container)."""
    from kvae_tpu.train.state import make_raw_train_step
    import jax

    raw = make_raw_train_step(model, cfg, tcfg, tx)
    step = jax.jit(raw, static_argnames=("phase",))
    log("compiling single train step (1 remote compile)...")
    state, metrics = step(state, x, "all")
    loss = float(metrics["loss"])
    log(f"single step compiled+run, loss={loss:.3f}; timing {iters} dispatched steps")
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, x, "all")
    float(metrics["loss"])  # hard sync
    sps = iters / (time.perf_counter() - t0)
    log(f"dispatched: {sps:.1f} steps/s")
    return step, state, sps, loss


def bench_chain(model, cfg, tcfg, tx, state, x, chain_len=200, windows=3):
    """Median-window steps/s of a fused chain of train steps (jitted
    `lax.scan`) — the committed trainer's dispatch mode (one XLA program per
    epoch, train/state.py epoch_run). One dispatch + one hard sync per
    window, so this measures device throughput without the host's per-step
    dispatch cost."""
    from functools import partial

    import jax

    from kvae_tpu.train.state import make_raw_train_step

    raw = make_raw_train_step(model, cfg, tcfg, tx)

    @partial(jax.jit, static_argnames=("phase",))
    def chain(state, x, phase):
        def body(st, _):
            st, metrics = raw(st, x, phase)
            return st, metrics["loss"]
        st, losses = jax.lax.scan(body, state, None, length=chain_len)
        return st, losses[-1]

    log(f"compiling fused {chain_len}-step chain (1 remote compile)...")
    state, last_loss = chain(state, x, "all")  # compile + warm in ONE call
    float(last_loss)
    log("chain compiled; timing windows")
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        state, last_loss = chain(state, x, "all")
        float(last_loss)  # hard sync
        rates.append(chain_len / (time.perf_counter() - t0))
    sps = sorted(rates)[len(rates) // 2]
    log(f"fused chain: {sps:.1f} steps/s")
    return chain, state, sps


def main():
    import jax
    import numpy as np

    from kvae_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    from kvae_tpu.config import KVAEConfig, TrainingConfig

    n_chips = jax.local_device_count()
    peak = peak_tflops()
    log(f"device: {jax.devices()[0]} (kind {jax.devices()[0].device_kind}), "
        f"budget {BUDGET_S:.0f}s")
    rng = np.random.default_rng(0)

    def data(b, t):
        return (rng.uniform(size=(b, t, 1, 32, 32)) > 0.5).astype(np.float32)

    # ---- 1. headline: provisional from the single step, then fused chain ----
    cfg = KVAEConfig(dynamics_model="lstm", num_modes=3, a_dim=2, z_dim=4,
                     out_distr="bernoulli", filter_impl="auto")
    tcfg = TrainingConfig(batch_size=32, T=20)
    log("headline: init on CPU backend...")
    model, state, tx, x = make_state(cfg, tcfg, data(32, 20))

    step, state, sps_disp, loss = bench_single_step(model, cfg, tcfg, tx, state, x)
    headline = {
        "metric": "train_steps_per_sec", "value": round(sps_disp, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps_disp / REFERENCE_STEPS_PER_SEC, 2),
        "ms_per_step": round(1000.0 / sps_disp, 3),
        "steps_per_sec_per_chip": round(sps_disp / n_chips, 3),
        "provisional": True,  # dispatched loop; fused-chain line follows
    }
    emit(headline)

    if remaining() > 60:
        chain, state, sps = bench_chain(model, cfg, tcfg, tx, state, x)
        flops = flops_per_step(step, state, x, "all") if remaining() > 60 else None
        headline = {
            "metric": "train_steps_per_sec", "value": round(sps, 3),
            "unit": "steps/s",
            "vs_baseline": round(sps / REFERENCE_STEPS_PER_SEC, 2),
            "ms_per_step": round(1000.0 / sps, 3),
            "steps_per_sec_per_chip": round(sps / n_chips, 3),
            **throughput_extras(sps, flops, peak),
        }
        emit(headline)
    else:
        log("budget: skipping headline fused chain")

    try:
        secondary_configs(n_chips, peak, data)
    finally:
        # LAST line = the headline (with vs_baseline) so a driver that parses
        # only the final record captures the >=10x gate number even if a later
        # stage raised or was budget-skipped.
        emit({**headline, "final": True})
    log("done")


def secondary_configs(n_chips, peak, data):
    from kvae_tpu.config import KVAEConfig, TrainingConfig

    # ---- 2. SKVAE (switching dynamics), same shapes ----
    if remaining() > 90:
        cfg = KVAEConfig(dynamics_model="switching", num_modes=3, a_dim=2,
                         z_dim=4, out_distr="bernoulli", filter_impl="auto")
        tcfg = TrainingConfig(batch_size=32, T=20)
        log("skvae: init on CPU backend...")
        model, state, tx, x = make_state(cfg, tcfg, data(32, 20))
        step, state, sps, loss = bench_single_step(model, cfg, tcfg, tx, state, x)
        if remaining() > 90:
            _, state, sps = bench_chain(model, cfg, tcfg, tx, state, x)
        flops = flops_per_step(step, state, x, "all") if remaining() > 90 else None
        emit({
            "metric": "skvae_train_steps_per_sec", "value": round(sps, 3),
            "unit": "steps/s",
            "vs_baseline": round(sps / REFERENCE_SKVAE_STEPS_PER_SEC, 2),
            "ms_per_step": round(1000.0 / sps, 3),
            "steps_per_sec_per_chip": round(sps / n_chips, 3),
            **throughput_extras(sps, flops, peak),
        })
    else:
        log("budget: skipping skvae")

    # ---- 3. scaling config: T=100, B=128, z=8, bfloat16 conv path ----
    if remaining() > 120:
        cfg = KVAEConfig(dynamics_model="switching", num_modes=3, a_dim=4,
                         z_dim=8, out_distr="bernoulli", filter_impl="auto",
                         compute_dtype="bfloat16")
        tcfg = TrainingConfig(batch_size=128, T=100)
        log("scaling_t100: init on CPU backend...")
        model, state, tx, x = make_state(cfg, tcfg, data(128, 100))
        step, state, sps, loss = bench_single_step(model, cfg, tcfg, tx, state, x,
                                                   iters=10)
        if remaining() > 120:
            _, state, sps = bench_chain(model, cfg, tcfg, tx, state, x,
                                        chain_len=50)
        flops = flops_per_step(step, state, x, "all") if remaining() > 120 else None
        emit({
            "metric": "scaling_t100_ms_per_step", "value": round(1000.0 / sps, 3),
            "unit": "ms/step", "vs_baseline": None,
            "steps_per_sec": round(sps, 3),
            "steps_per_sec_per_chip": round(sps / n_chips, 3),
            **throughput_extras(sps, flops, peak),
        })
    else:
        log("budget: skipping scaling_t100")


if __name__ == "__main__":
    main()
