"""Serving / deployment layer: AOT-exported artifacts + a no-recompile
inference session.

TPU-native serving is ahead-of-time: compile the inference program ONCE to a
portable artifact and never trace, retrace, or recompile on the request path.
Two pieces:

- `export_imputer` / `load_exported`: serialize the jitted imputation (or
  generation) program via `jax.export` to self-contained bytes — StableHLO
  with the trained parameters baked in as constants. The artifact loads and
  runs WITHOUT the model code, flax, or the config (only jax), and is the
  unit you'd ship to a serving fleet.
- `InferenceSession`: an in-process server. Requests of any batch size are
  padded up to a fixed set of batch buckets, so every request hits one of
  len(buckets) pre-compiled programs; batch rows are independent end-to-end
  (per-sequence Kalman recursion, per-frame convs — no cross-batch coupling),
  so padding rows never leak into real outputs (gated by test).
- `StreamingSession` / `export_stream`: ONLINE inference — one frame in,
  filtered state + one-step-ahead prediction out, O(1) per frame. Exact
  (matches the offline masked filter, gated by test); requires the causal
  LSTM-alpha dynamics (the switching BiGRU posterior is acausal).

The reference has no serving story at all (single-process research trainer,
SURVEY.md §2.2); this subsystem is beyond-parity by design for the
"production deployment" goal.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kvae_tpu.config import KVAEConfig
from kvae_tpu.models.kvae import KVAE

__all__ = [
    "export_imputer",
    "export_generator",
    "export_stream",
    "load_exported",
    "InferenceSession",
    "StreamingSession",
]


def _impute_fn(model: KVAE, params) -> "callable":
    """(x, mask, key) -> impute outputs, params closed over (baked into the
    exported artifact as constants)."""

    def fn(x: jax.Array, mask: jax.Array, key: jax.Array):
        k_sample, k_gumbel = jax.random.split(key)
        return model.apply(
            {"params": params}, x, mask,
            rngs={"sample": k_sample, "gumbel": k_gumbel},
            method=KVAE.impute,
        )

    return fn


def _generate_fn(model: KVAE, params, gen_steps: int) -> "callable":
    def fn(x_warmup: jax.Array, key: jax.Array):
        k_sample, k_gumbel = jax.random.split(key)
        return model.apply(
            {"params": params}, x_warmup, gen_steps,
            rngs={"sample": k_sample, "gumbel": k_gumbel},
            method=KVAE.generate,
        )

    return fn


def _frame_shape(cfg: KVAEConfig) -> Tuple[int, int, int]:
    return (cfg.img_channels, cfg.img_size, cfg.img_size)


def export_imputer(
    cfg: KVAEConfig, params, batch_size: int, T: int
) -> bytes:
    """Serialize the masked-imputation program for shapes [B,T,C,H,W] to a
    portable self-contained artifact (StableHLO + params as constants).

    Call signature of the loaded artifact:
        outputs = fn(x[B,T,C,H,W] f32, mask[B,T] f32, key: uint32[2])
    with the same output dict as `KVAE.impute`."""
    model = KVAE(cfg)
    c, h, w = _frame_shape(cfg)
    specs = (
        jax.ShapeDtypeStruct((batch_size, T, c, h, w), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, T), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    exported = jax.export.export(jax.jit(_impute_fn(model, params)))(*specs)
    return exported.serialize()


def export_generator(
    cfg: KVAEConfig, params, batch_size: int, warmup_steps: int, gen_steps: int
) -> bytes:
    """Serialize the posterior-warmup free-run generation program.

    Loaded signature: outputs = fn(x_warmup[B,Tw,C,H,W] f32, key: uint32[2])
    -> {'z_gen', 'a_gen', 'x_gen'} (KVAE.generate)."""
    model = KVAE(cfg)
    c, h, w = _frame_shape(cfg)
    specs = (
        jax.ShapeDtypeStruct((batch_size, warmup_steps, c, h, w), jnp.float32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    fn = _generate_fn(model, params, gen_steps)
    exported = jax.export.export(jax.jit(fn))(*specs)
    return exported.serialize()


def load_exported(blob: bytes) -> "callable":
    """Rehydrate an exported artifact into a callable. Needs only jax — no
    model code, flax module, or config on the serving host."""
    exported = jax.export.deserialize(bytearray(blob))
    return jax.jit(exported.call)


class InferenceSession:
    """No-recompile batched inference: requests pad up to fixed batch
    buckets, each bucket compiles once (lazily) and is cached for the life of
    the session. Accepts/returns numpy; rows beyond the true batch are
    padding and are stripped before returning.

    >>> sess = InferenceSession(cfg, state.params, T=20, buckets=(1, 8, 32))
    >>> out = sess.impute(x_np, mask_np)      # any B <= max(buckets)
    """

    def __init__(
        self,
        cfg: KVAEConfig,
        params,
        T: int,
        buckets: Sequence[int] = (1, 8, 32),
        seed: int = 0,
    ):
        if not buckets or sorted(buckets) != list(buckets):
            raise ValueError(f"buckets must be ascending and non-empty: {buckets}")
        self.cfg = cfg
        self.T = int(T)
        self.buckets = tuple(int(b) for b in buckets)
        self._model = KVAE(cfg)
        self._params = params
        self._key = jax.random.PRNGKey(seed)
        self._impute = jax.jit(_impute_fn(self._model, params))
        self._gen_cache: Dict[Tuple[int, int], "callable"] = {}

    def _bucket(self, b: int) -> int:
        for cap in self.buckets:
            if b <= cap:
                return cap
        raise ValueError(
            f"batch {b} exceeds the largest bucket {self.buckets[-1]}; "
            "configure a larger bucket"
        )

    def _next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def _pad(self, arr: np.ndarray, cap: int) -> np.ndarray:
        b = arr.shape[0]
        if b == cap:
            return arr
        # repeat row 0 (valid data keeps kernels on the fast path; padded
        # rows are discarded on return)
        pad = np.repeat(arr[:1], cap - b, axis=0)
        return np.concatenate([arr, pad], axis=0)

    def impute(
        self, x: np.ndarray, mask: np.ndarray
    ) -> Dict[str, np.ndarray]:
        """x: [B,T,C,H,W] float32, mask: [B,T] (1=observed). B may be any
        size up to max(buckets); T must equal the session's T."""
        x = np.asarray(x, np.float32)
        mask = np.asarray(mask, np.float32)
        if x.ndim != 5 or x.shape[1] != self.T:
            raise ValueError(f"x must be [B,{self.T},C,H,W], got {x.shape}")
        b = x.shape[0]
        cap = self._bucket(b)
        out = self._impute(
            jnp.asarray(self._pad(x, cap)),
            jnp.asarray(self._pad(mask, cap)),
            self._next_key(),
        )
        return {k: np.asarray(v)[:b] for k, v in out.items()}

    def generate(
        self, x_warmup: np.ndarray, gen_steps: int
    ) -> Dict[str, np.ndarray]:
        """Posterior warmup on x_warmup [B,Tw,C,H,W], then free-run
        `gen_steps` frames. gen_steps is a compile-time constant; each
        distinct (bucket, gen_steps) pair compiles once."""
        x_warmup = np.asarray(x_warmup, np.float32)
        b = x_warmup.shape[0]
        cap = self._bucket(b)
        sig = (cap, int(gen_steps))
        if sig not in self._gen_cache:
            self._gen_cache[sig] = jax.jit(
                _generate_fn(self._model, self._params, int(gen_steps))
            )
        out = self._gen_cache[sig](
            jnp.asarray(self._pad(x_warmup, cap)), self._next_key()
        )
        return {k: np.asarray(v)[:b] for k, v in out.items()}

    # -- artifact round-trip ------------------------------------------------

    def export(self, bucket: Optional[int] = None) -> bytes:
        """Export this session's imputation program (largest bucket by
        default) as a portable artifact (see `export_imputer`)."""
        return export_imputer(
            self.cfg, self._params, bucket or self.buckets[-1], self.T
        )


# ---------------------------------------------------------------------------
# Online (streaming) inference
# ---------------------------------------------------------------------------

def _stream_fns(cfg: KVAEConfig, params):
    """(init, step) callables with params closed over. `step` signature:
    (carry, frame[B,C,H,W], observed[B]) -> (carry', outputs)."""
    model = KVAE(cfg)

    def init(batch: int):
        return model.apply({"params": params}, batch, method=KVAE.stream_init)

    def step(carry, frame, observed):
        return model.apply(
            {"params": params}, carry, frame, observed, method=KVAE.stream_step
        )

    return init, step


def export_stream(cfg: KVAEConfig, params, batch_size: int) -> bytes:
    """Serialize the streaming filter step to a portable artifact.

    The loaded callable is the pure transition
        (carry, frame[B,C,H,W] f32, observed[B] f32) -> (carry', outputs)
    where `carry` is the pytree returned by `StreamingSession.initial_carry`
    (and threaded back by the caller between frames) — the serving host owns
    the state, the program stays pure. Only causal (lstm) dynamics stream;
    see KVAE.stream_init."""
    init, step = _stream_fns(cfg, params)
    c, h, w = _frame_shape(cfg)
    carry_spec = jax.eval_shape(lambda: init(batch_size))
    specs = (
        carry_spec,
        jax.ShapeDtypeStruct((batch_size, c, h, w), jnp.float32),
        jax.ShapeDtypeStruct((batch_size,), jnp.float32),
    )
    exported = jax.export.export(jax.jit(step))(*specs)
    return exported.serialize()


class StreamingSession:
    """Online per-frame inference: feed frames one at a time, get the
    filtered state estimate, decoded filtered frame and one-step-ahead
    prediction back with O(1) work and constant memory per frame. The
    per-frame latency is one pre-compiled XLA program (compiled lazily on
    the first frame, cached for the session's life).

    Requires causal dynamics (dynamics_model='lstm'; the switching BiGRU
    posterior is acausal — KVAE.stream_init docstring).

    >>> sess = StreamingSession(cfg, state.params, batch_size=1)
    >>> for frame in camera:                     # [1,C,H,W]
    ...     out = sess.step(frame)               # observed frame
    >>> out = sess.step(None)                    # dropped frame: predict-only
    """

    def __init__(self, cfg: KVAEConfig, params, batch_size: int):
        self.cfg = cfg
        self.batch_size = int(batch_size)
        init, step = _stream_fns(cfg, params)
        self._params = params
        self._init = init
        self._step = jax.jit(step)
        self._carry = init(self.batch_size)
        self._frame_shape = _frame_shape(cfg)

    def reset(self) -> None:
        """Start a new sequence (reference dyn_params.reset_state +
        prior-reset of the filter posterior)."""
        self._carry = self._init(self.batch_size)

    @property
    def initial_carry(self):
        return self._init(self.batch_size)

    def step(
        self,
        frame: Optional[np.ndarray],
        observed: Optional[np.ndarray] = None,
    ) -> Dict[str, np.ndarray]:
        """Advance one frame. `frame` [B,C,H,W] (or None = all-missing:
        pure predict step, e.g. a dropped camera frame); `observed` [B]
        optionally marks per-row missingness."""
        c, h, w = self._frame_shape
        if frame is None:
            if observed is not None:
                raise ValueError(
                    "frame=None means a fully-missing step; passing `observed` "
                    "alongside it is contradictory — supply the frame"
                )
            frame = np.zeros((self.batch_size, c, h, w), np.float32)
            observed = np.zeros((self.batch_size,), np.float32)
        frame = np.asarray(frame, np.float32)
        if frame.shape != (self.batch_size, c, h, w):
            raise ValueError(
                f"frame must be [{self.batch_size},{c},{h},{w}], got {frame.shape}"
            )
        if observed is None:
            observed = np.ones((self.batch_size,), np.float32)
        self._carry, out = self._step(
            self._carry, jnp.asarray(frame),
            jnp.asarray(np.asarray(observed, np.float32)),
        )
        return {k: np.asarray(v) for k, v in out.items()}

    def export(self) -> bytes:
        """Portable artifact of the streaming step (see `export_stream`)."""
        return export_stream(self.cfg, self._params, self.batch_size)
