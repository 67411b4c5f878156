"""Dynamics-parameter networks: LSTM-alpha mixing and switching (SKVAE) regimes.

Reference parity:
  - LSTMAlphaDynamics  <- reference kvae/kalman/dyn_param.py:5-63
    Learnable banks A[K,n,n] (init identity), B[K,n,m], C[K,p,n]
    (init N(0, init_std^2)); for K>1 a 1-layer LSTM(p->hidden) + linear head
    -> softmax alpha weights; head bias init -10 except mode 0 so alpha starts
    pinned at mode 0 (:31-33). Steps INSIDE the filter scan on the masked
    pseudo-observation feedback.
  - SwitchingDynamics  <- reference kvae/kalman/switch_dyn_param.py:7-95
    Banks A,B,C and per-regime Q; whole-sequence BiGRU posterior giving
    transition logits [B,T,K,K] + init logits [B,K]
    (MarkovVariationalRegimePosterior, :113-129); regime chain sampled
    sequentially with gumbel-softmax(tau, hard=not training) (:52-79, a
    `lax.scan` here); sticky Markov prior (:98-110); A/B/Q mixed per step,
    C shared = C[0] (:82-86). Returns (log_q, log_p) ELBO terms.

Both are flax modules with `setup`-materialized params so their step math is
safe to close over inside `lax.scan` bodies.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from kvae_tpu.ops.precision import einsum

from kvae_tpu.models import rnn
from kvae_tpu.ops.lgssm import SequenceDynamics


def sticky_transition_matrix(K: int, p_stay: float, dtype=jnp.float32) -> jax.Array:
    """K x K sticky prior: p_stay on the diagonal, uniform elsewhere
    (reference switch_dyn_param.py:98-110). Not learned."""
    if K == 1:
        return jnp.ones((1, 1), dtype=dtype)
    off = (1.0 - p_stay) / (K - 1)
    return jnp.full((K, K), off, dtype=dtype) + (p_stay - off) * jnp.eye(K, dtype=dtype)


def gumbel_softmax(
    key: jax.Array, logits: jax.Array, tau: jax.Array, hard: bool
) -> jax.Array:
    """Gumbel-softmax with optional straight-through hard one-hot
    (torch.nn.functional.gumbel_softmax semantics, used at
    reference switch_dyn_param.py:52,69)."""
    g = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y = jax.nn.softmax((logits + g) / tau, axis=-1)
    if hard:
        y_hard = jax.nn.one_hot(jnp.argmax(y, axis=-1), logits.shape[-1], dtype=y.dtype)
        y = y_hard + y - jax.lax.stop_gradient(y)
    return y


def _bank_init_A(K: int, n: int):
    def init(key, shape, dtype=jnp.float32):
        del key, shape
        return jnp.broadcast_to(jnp.eye(n, dtype=dtype), (K, n, n))
    return init


def _bank_init_normal(std: float):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def _alpha_head_bias(K: int, off_bias: float = -10.0):
    """Head-bias init: `off_bias` on modes 1..K-1, 0 on mode 0, so alpha
    starts near mode 0 (reference dyn_param.py:31-33 uses -10, an almost
    hard lock: during the warmup phase the alpha net is frozen, so only
    mode 0's bank receives gradient. A softer value (e.g. -2) lets every
    bank train from the start while still breaking symmetry.)"""
    def init(key, shape, dtype=jnp.float32):
        del key
        return jnp.full(shape, off_bias, dtype).at[0].set(0.0)
    return init


class LSTMAlphaDynamics(nn.Module):
    """Original-KVAE alpha network; stepped inside the filter scan."""

    K: int
    n: int
    m: int
    p: int
    hidden: int = 50
    init_std: float = 0.05
    alpha_bias_init: float = -10.0

    def setup(self):
        self.A = self.param("A", _bank_init_A(self.K, self.n), (self.K, self.n, self.n))
        self.B = self.param("B", _bank_init_normal(self.init_std), (self.K, self.n, self.m))
        self.C = self.param("C", _bank_init_normal(self.init_std), (self.K, self.p, self.n))
        if self.K > 1:
            self.lstm = rnn.lstm_params(self, "lstm", self.p, self.hidden)
            self.head_w = self.param(
                "head_w", nn.initializers.lecun_normal(), (self.hidden, self.K)
            )
            self.head_b = self.param(
                "head_b", _alpha_head_bias(self.K, self.alpha_bias_init),
                (self.K,),
            )

    def init_carry(self, batch: int):
        if self.K == 1:
            return ()
        return rnn.lstm_init_carry(batch, self.hidden)

    def step(self, carry, y_prev: jax.Array, Q_fixed: jax.Array):
        """One alpha step (reference dyn_param.py:39-63).

        Args:
            carry: LSTM (h, c) or () for K=1.
            y_prev: [B,p] masked pseudo-observation from the previous filter step.
            Q_fixed: [n,n] fixed process noise (LSTM mode has no learned Q).
        Returns:
            (carry', (A,B,C,Q, alpha)) with A,B,C mixed per batch element.
        """
        batch = y_prev.shape[0]
        if self.K == 1:
            alpha = jnp.ones((batch, 1), dtype=y_prev.dtype)
            A = jnp.broadcast_to(self.A[0], (batch, self.n, self.n))
            B = jnp.broadcast_to(self.B[0], (batch, self.n, self.m))
            C = jnp.broadcast_to(self.C[0], (batch, self.p, self.n))
        else:
            carry, h = rnn.lstm_step(self.lstm, carry, y_prev)
            alpha = jax.nn.softmax(h @ self.head_w + self.head_b, axis=-1)
            A = einsum("bk,kij->bij", alpha, self.A)
            B = einsum("bk,knm->bnm", alpha, self.B)
            C = einsum("bk,kpn->bpn", alpha, self.C)
        Q = jnp.broadcast_to(Q_fixed, (batch, self.n, self.n))
        return carry, (A, B, C, Q, alpha)

    def sequence(self, a_seq: jax.Array, Q_fixed: jax.Array):
        """Whole-sequence dynamics for the UNMASKED filter.

        With an all-ones mask the filter's pseudo-observation feedback
        reduces to the observed sequence itself (reference
        kalman_filter.py:183-185 with m=1, zeros at t=0, :142), so the
        alpha-LSTM input is just [0, a_0, ..., a_{T-2}] — independent of the
        filter state. The two recursions decouple and the per-step (A,B,C,Q)
        can be precomputed for the whole sequence, unlocking the fused
        sequence-dynamics engines (pallas / pallas_adjoint / assoc) for the
        LSTM-dynamics model. Bitwise-equivalent to stepping `step` inside the
        filter scan with mask=1 (tests/test_models.py gates this).

        Args:
            a_seq: [B,T,p] encoder latents (the observed sequence).
            Q_fixed: [n,n] fixed process noise.
        Returns:
            (SequenceDynamics with [B,T,...] leaves, alpha [B,T,K]).
        """
        batch, T, _ = a_seq.shape
        dtype = a_seq.dtype
        if self.K == 1:
            alpha = jnp.ones((batch, T, 1), dtype=dtype)
            seq = SequenceDynamics(
                A=jnp.broadcast_to(self.A[0], (batch, T, self.n, self.n)),
                B=jnp.broadcast_to(self.B[0], (batch, T, self.n, self.m)),
                C=jnp.broadcast_to(self.C[0], (batch, T, self.p, self.n)),
                Q=jnp.broadcast_to(Q_fixed, (batch, T, self.n, self.n)),
            )
            return seq, alpha

        y_in = jnp.concatenate(
            [jnp.zeros((batch, 1, self.p), dtype=dtype), a_seq[:, :-1]], axis=1
        )
        h_seq = rnn.lstm_scan(self.lstm, y_in)  # [B,T,H]
        alpha = jax.nn.softmax(h_seq @ self.head_w + self.head_b, axis=-1)
        seq = SequenceDynamics(
            A=einsum("btk,kij->btij", alpha, self.A),
            B=einsum("btk,knm->btnm", alpha, self.B),
            C=einsum("btk,kpn->btpn", alpha, self.C),
            Q=jnp.broadcast_to(Q_fixed, (batch, T, self.n, self.n)),
        )
        return seq, alpha


class MarkovRegimePosterior(nn.Module):
    """BiGRU over a_seq -> transition logits [B,T,K,K] + init logits [B,K]
    (reference switch_dyn_param.py:113-129)."""

    K: int
    input_dim: int
    hidden: int = 32

    def setup(self):
        self.gru_fwd = rnn.gru_params(self, "gru_fwd", self.input_dim, self.hidden)
        self.gru_bwd = rnn.gru_params(self, "gru_bwd", self.input_dim, self.hidden)
        self.linear_head = nn.Dense(self.K * self.K, name="linear_head")
        self.init_head = nn.Dense(self.K, name="init_head")

    def __call__(self, a_seq: jax.Array) -> Tuple[jax.Array, jax.Array]:
        b, t, _ = a_seq.shape
        h_seq = rnn.bigru_scan(self.gru_fwd, self.gru_bwd, a_seq)  # [B,T,2H]
        logits = self.linear_head(h_seq).reshape(b, t, self.K, self.K)
        init_logits = self.init_head(h_seq[:, 0])
        return logits, init_logits


class SwitchingDynamics(nn.Module):
    """SKVAE switching-linear-dynamics parameter network."""

    K: int
    n: int
    m: int
    p: int
    hidden: int = 32
    init_std: float = 0.05
    p_stay: float = 0.8
    noise_transition: float = 0.02

    def setup(self):
        self.A = self.param("A", _bank_init_A(self.K, self.n), (self.K, self.n, self.n))
        self.B = self.param("B", _bank_init_normal(self.init_std), (self.K, self.n, self.m))
        self.C = self.param("C", _bank_init_normal(self.init_std), (self.K, self.p, self.n))

        def q_init(key, shape, dtype=jnp.float32):
            del key
            return jnp.broadcast_to(
                jnp.eye(self.n, dtype=dtype) * self.noise_transition,
                (self.K, self.n, self.n),
            )

        self.Q = self.param("Q", q_init, (self.K, self.n, self.n))
        self.posterior = MarkovRegimePosterior(self.K, input_dim=self.p, hidden=self.hidden)

    def __call__(
        self,
        a_seq: jax.Array,
        tau: jax.Array,
        hard: bool,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[SequenceDynamics, jax.Array, jax.Array, jax.Array]:
        """Sample the regime chain and mix the dynamics banks
        (reference switch_dyn_param.py:37-92).

        Args:
            a_seq: [B,T,p] encoder latents (the posterior's input).
            tau: Gumbel-softmax temperature (traced scalar — annealed without
                 recompilation).
            hard: straight-through one-hot sampling (eval mode); static.
            rng: PRNG key for the Gumbel noise (required for K>1).
        Returns:
            (SequenceDynamics, log_q [B,T], log_p [B,T], state_probs [B,T,K]).
        """
        batch, T, _ = a_seq.shape
        dtype = a_seq.dtype

        if self.K == 1:
            seq = SequenceDynamics(
                A=jnp.broadcast_to(self.A[0], (batch, T, self.n, self.n)),
                B=jnp.broadcast_to(self.B[0], (batch, T, self.n, self.m)),
                C=jnp.broadcast_to(self.C[0], (batch, T, self.p, self.n)),
                Q=jnp.broadcast_to(self.Q[0], (batch, T, self.n, self.n)),
            )
            zeros = jnp.zeros((batch, T), dtype=dtype)
            probs = jnp.ones((batch, T, 1), dtype=dtype)
            return seq, zeros, zeros, probs

        if rng is None:
            raise ValueError("SwitchingDynamics with K>1 requires an rng key")

        logits, init_logits = self.posterior(a_seq)  # [B,T,K,K], [B,K]
        trans = sticky_transition_matrix(self.K, self.p_stay, dtype)

        key0, key_chain = jax.random.split(rng)
        y0 = gumbel_softmax(key0, init_logits, tau, hard)
        log_q0 = jnp.sum(y0 * jax.nn.log_softmax(init_logits, axis=-1), axis=-1)
        log_p0 = jnp.sum(y0 * jnp.log(jnp.full_like(y0, 1.0 / self.K)), axis=-1)

        chain_keys = jax.random.split(key_chain, T - 1)
        logits_t = jnp.swapaxes(logits[:, 1:], 0, 1)  # [T-1,B,K,K]

        def body(y_prev, xs):
            l_mat, k = xs
            l_t = einsum("bk,bkj->bj", y_prev, l_mat)
            y_t = gumbel_softmax(k, l_t, tau, hard)
            log_q = jnp.sum(y_t * jax.nn.log_softmax(l_t, axis=-1), axis=-1)
            trans_probs = einsum("bk,kj->bj", y_prev, trans)
            log_p = jnp.sum(y_t * jnp.log(jnp.clip(trans_probs, min=1e-8)), axis=-1)
            return y_t, (y_t, log_q, log_p)

        _, (y_rest, log_q_rest, log_p_rest) = jax.lax.scan(
            body, y0, (logits_t, chain_keys), unroll=4
        )
        y_seq = jnp.concatenate([y0[:, None], jnp.swapaxes(y_rest, 0, 1)], axis=1)
        log_q = jnp.concatenate([log_q0[:, None], jnp.swapaxes(log_q_rest, 0, 1)], axis=1)
        log_p = jnp.concatenate([log_p0[:, None], jnp.swapaxes(log_p_rest, 0, 1)], axis=1)

        seq = SequenceDynamics(
            A=einsum("btk,kij->btij", y_seq, self.A),
            B=einsum("btk,knm->btnm", y_seq, self.B),
            Q=einsum("btk,kij->btij", y_seq, self.Q),
            # emission shared across regimes: C = C[0] (reference :85-86)
            C=jnp.broadcast_to(self.C[0], (batch, T, self.p, self.n)),
        )
        return seq, log_q, log_p, y_seq
