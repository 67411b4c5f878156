"""Attribute the round-4 headline jump (413 -> 1587 steps/s).

Times the bench headline config's fused train-step chain (the same program
bench.py times: one jitted lax.scan of train steps) against a given
kvae_tpu tree — run it once against HEAD and once against a worktree of
the pre-safe_cholesky-VJP commit (207c888^) to attribute the step-time
change to that fix:

    python tools/ablate_headline.py                       # current tree
    git worktree add /tmp/pre_vjp 207c888^
    PYTHONPATH=/tmp/pre_vjp python tools/ablate_headline.py

Prints one JSON line {"ms_per_step": ..., "steps_per_sec": ..., "tree": ...}.
"""
import json
import os
import sys
import time

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_target = os.environ.get("KVAE_TREE") or _repo  # KVAE_TREE: alternate tree
sys.path.insert(0, _target)

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import kvae_tpu
    from kvae_tpu.config import load_config
    from kvae_tpu.train.state import create_train_state, make_raw_train_step

    tree = os.path.dirname(os.path.dirname(os.path.abspath(kvae_tpu.__file__)))
    cfgs = load_config(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "kvae_ball.yaml",
    ))
    cfg, tcfg = cfgs["kvae"], cfgs["training"]
    bs, T = tcfg.batch_size, tcfg.T

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(bs, T, 1, 32, 32)).astype(np.float32))
    model, state, tx = create_train_state(cfg, tcfg, x)
    raw = make_raw_train_step(model, cfg, tcfg, tx)

    chain_len = 100

    @jax.jit
    def chain(state, x):
        def body(st, _):
            st, metrics = raw(st, x, "all")
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=chain_len)

    t0 = time.time()
    st, losses = chain(state, x)
    _ = float(losses[-1])  # hard sync (block_until_ready is a no-op here)
    compile_s = time.time() - t0

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st, losses = chain(st, x)
        _ = float(losses[-1])
        best = min(best, (time.time() - t0) / chain_len)
    print(json.dumps({
        "tree": tree,
        "config": "kvae_ball (headline: bs=%d T=%d z=%d K=%d %s)" % (
            bs, T, cfg.z_dim, cfg.num_modes, cfg.dynamics_model),
        "chain_len": chain_len,
        "compile_s": round(compile_s, 1),
        "ms_per_step": round(1000 * best, 3),
        "steps_per_sec": round(1.0 / best, 1),
    }))


if __name__ == "__main__":
    main()
