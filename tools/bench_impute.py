"""Measure imputation (masked inference) latency: fused coupled kernel vs
the per-step coupled scan (the PARITY.md masked-LSTM speedup number).

KVAE.impute with dynamics_model='lstm' and a planning mask is the one hot
path whose recursion couples the alpha-LSTM to the filter; on the pallas
engines it runs the fused VMEM kernel (ops/pallas_kf_lstm.py), on 'scan'
the per-step lax.scan. Reports median wall-clock per call over windows of
dispatched calls with a hard value-fetch sync (block_until_ready does not
synchronize on tunneled backends).

Run on TPU: python tools/bench_impute.py [--batch 32] [--T 20]
"""
import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--T", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from kvae_tpu.utils.platform import apply_env_platform, enable_compilation_cache

    apply_env_platform()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from kvae_tpu.config import KVAEConfig
    from kvae_tpu.data.masks import mask_impute_planning
    from kvae_tpu.models.kvae import KVAE

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        (rng.uniform(size=(args.batch, args.T, 1, 32, 32)) > 0.7), jnp.float32
    )
    mask = jnp.asarray(mask_impute_planning(args.batch, args.T, 4, 12))

    base = KVAEConfig(dynamics_model="lstm", num_modes=3, a_dim=2, z_dim=4)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1),
            "gumbel": jax.random.PRNGKey(2)}
    model0 = KVAE(dataclasses.replace(base, filter_impl="scan"))
    variables = model0.init(rngs, x, tau=jnp.asarray(1.0), train=True)
    call_rngs = {"sample": jax.random.PRNGKey(3), "gumbel": jax.random.PRNGKey(4)}

    results = {}
    for impl in ("scan", "pallas"):
        model = KVAE(dataclasses.replace(base, filter_impl=impl))

        @jax.jit
        def impute(v, x, mask):
            return model.apply(v, x, mask, rngs=call_rngs, method=KVAE.impute)

        t0 = time.perf_counter()
        out = impute(variables, x, mask)
        float(jnp.sum(out["x_imputed"]))
        compile_s = time.perf_counter() - t0
        rates = []
        for _ in range(args.windows):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = impute(variables, x, mask)
            float(jnp.sum(out["x_imputed"]))
            rates.append((time.perf_counter() - t0) / args.iters)
        ms = 1000.0 * sorted(rates)[len(rates) // 2]
        results[impl] = ms
        print(f"{impl:7s}: {ms:8.3f} ms/impute (B={args.batch} T={args.T}; "
              f"compile+warm {compile_s:.1f}s)", flush=True)
    print(f"speedup: {results['scan'] / results['pallas']:.2f}x "
          f"(fused coupled kernel vs per-step scan)")


if __name__ == "__main__":
    main()
