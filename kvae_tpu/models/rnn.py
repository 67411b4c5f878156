"""Minimal recurrent cells as pure param-pytree functions.

The filter's LSTM-alpha network must step *inside* the Kalman `lax.scan`
(its input is the filter's own masked prediction feedback — reference
kvae/kalman/kalman_filter.py:159,183-185), so the cells are written as pure
functions over explicit parameter pytrees rather than stateful modules:
params are materialized once in the owning flax module's `setup` and the
step math closes over concrete arrays, which is `lax.scan`-safe.

Gate conventions follow torch.nn.LSTM / torch.nn.GRU (reference
kvae/kalman/dyn_param.py:23-28, switch_dyn_param.py:118) so behavior is
comparable; initializers are the flax defaults.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _torch_rnn_init(hidden: int):
    """torch.nn.LSTM/GRU default: every weight and bias ~ U(-k, k) with
    k = 1/sqrt(hidden). The flax defaults (lecun normal inputs, orthogonal
    recurrent) are ~5x larger at these sizes and measurably destabilize the
    alpha-LSTM once it unfreezes in phase 'all' (see PARITY.md)."""
    k = 1.0 / (hidden ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-k, maxval=k)

    return init


def lstm_params(module: nn.Module, name: str, in_dim: int, hidden: int):
    """Create fused LSTM gate parameters on `module` (call from setup)."""
    init = _torch_rnn_init(hidden)
    wi = module.param(f"{name}_wi", init, (in_dim, 4 * hidden))
    wh = module.param(f"{name}_wh", init, (hidden, 4 * hidden))
    # torch carries two bias vectors (bias_ih + bias_hh); their sum is what
    # the cell sees, so one U(-k,k)+U(-k,k)-distributed vector is equivalent
    b = module.param(f"{name}_b", init, (4 * hidden,))
    return {"wi": wi, "wh": wh, "b": b}


def lstm_step(p, carry, x):
    """One LSTM step. carry = (h, c), x: [B, in_dim]. Single fused matmul per
    operand; gate order (i, f, g, o)."""
    h, c = carry
    gates = x @ p["wi"] + h @ p["wh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return (h_new, c_new), h_new


def lstm_init_carry(batch: int, hidden: int, dtype=jnp.float32):
    z = jnp.zeros((batch, hidden), dtype=dtype)
    return (z, z)


def gru_params(module: nn.Module, name: str, in_dim: int, hidden: int):
    """Create fused GRU gate parameters on `module` (call from setup).
    Torch convention: separate input/hidden biases because the candidate gate
    applies r *inside* the hidden contribution."""
    init = _torch_rnn_init(hidden)
    wi = module.param(f"{name}_wi", init, (in_dim, 3 * hidden))
    wh = module.param(f"{name}_wh", init, (hidden, 3 * hidden))
    bi = module.param(f"{name}_bi", init, (3 * hidden,))
    bh = module.param(f"{name}_bh", init, (3 * hidden,))
    return {"wi": wi, "wh": wh, "bi": bi, "bh": bh}


def gru_step(p, h, x):
    """One GRU step (torch gate order r, z, n)."""
    gi = x @ p["wi"] + p["bi"]
    gh = h @ p["wh"] + p["bh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    h_new = (1.0 - z) * n + z * h
    return h_new, h_new


def gru_scan(p, x_seq: jax.Array, reverse: bool = False) -> jax.Array:
    """Run a GRU over a whole [B,T,in] sequence; returns hidden states [B,T,H].

    The input projection x @ wi + bi has no recurrent dependency, so it is
    hoisted out of the scan as one batched [B*T] matmul (MXU-friendly); only
    the h @ wh recurrence stays sequential."""
    batch = x_seq.shape[0]
    hidden = p["wh"].shape[0]
    h0 = jnp.zeros((batch, hidden), dtype=x_seq.dtype)
    gi_seq = jnp.swapaxes(x_seq @ p["wi"] + p["bi"], 0, 1)  # [T,B,3H]

    def body(h, gi):
        gh = h @ p["wh"] + p["bh"]
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, hs = jax.lax.scan(body, h0, gi_seq, reverse=reverse, unroll=4)
    return jnp.swapaxes(hs, 0, 1)


def lstm_scan(p, x_seq: jax.Array) -> jax.Array:
    """Run an LSTM over a whole [B,T,in] sequence; returns hidden states
    [B,T,H]. Input projection hoisted out of the scan (see gru_scan)."""
    batch = x_seq.shape[0]
    hidden = p["wh"].shape[0]
    gi_seq = jnp.swapaxes(x_seq @ p["wi"] + p["b"], 0, 1)  # [T,B,4H]

    def body(carry, gi):
        h, c = carry
        gates = gi + h @ p["wh"]
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    _, hs = jax.lax.scan(
        body, lstm_init_carry(batch, hidden, x_seq.dtype), gi_seq, unroll=4
    )
    return jnp.swapaxes(hs, 0, 1)


def bigru_scan(p_fwd, p_bwd, x_seq: jax.Array) -> jax.Array:
    """Bidirectional GRU over [B,T,in] -> [B,T,2H] (torch bidirectional=True
    semantics: backward pass consumes the reversed sequence; outputs are
    concatenated per time step)."""
    h_f = gru_scan(p_fwd, x_seq, reverse=False)
    h_b = gru_scan(p_bwd, x_seq, reverse=True)
    return jnp.concatenate([h_f, h_b], axis=-1)
