"""Sequence parallelism: the Kalman filter/smoother with the TIME axis
sharded across devices.

The reference processes T in a serial Python loop on one device (SURVEY.md
§2.5, §5 long-context); the single-chip TPU answers here are `lax.scan`
(ops/lgssm.py), the fused Pallas kernels (ops/pallas_kf.py) and the O(log T)
associative scan (ops/assoc.py). This module is the multi-chip half of the
long-sequence story: shard [B, T, ...] along T over a mesh axis and run

  1. the associative-scan FILTER per shard locally (O(log T_local) depth),
  2. a cross-device exclusive prefix of each shard's composed element —
     log2(D) `lax.ppermute` rounds over ICI (Hillis-Steele), each carrying
     one [B, n(n+2)]-sized element, NOT the sequence,
  3. one local combine applying the prefix to every local element,

and the same scheme in reverse for the RTS SMOOTHER (suffix products). The
per-device compute is exactly the ops/assoc.py math, so equivalence to the
sequential scan is inherited from test_assoc.py and re-gated end-to-end in
tests/test_seqpar.py on a virtual mesh. Differentiable end-to-end
(shard_map and ppermute both have transposes), so it trains.

Communication cost per step: 2·log2(D) ppermute hops of O(B·n²) bytes —
independent of T. Compute per device is O(T/D · log(T/D)). This is the
associative-scan analogue of ring pipelining; it rides ICI neighbor links.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kvae_tpu.ops.precision import einsum
from kvae_tpu.ops.assoc import (
    _FilterElem,
    _SmoothElem,
    _filter_combine,
    _generic_filter_elements,
    _prior_first_element,
    _smooth_combine,
)
from kvae_tpu.ops.gaussian import symmetrize
from kvae_tpu.ops.lgssm import (
    FilterResult,
    LGSSMParams,
    SequenceDynamics,
    SmoothResult,
)

TIME_AXIS = "time"


def make_time_mesh(num_devices: Optional[int] = None, axis: str = TIME_AXIS) -> Mesh:
    import numpy as np

    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_data_time_mesh(
    data: int, time: int, data_axis: str = "data", time_axis: str = TIME_AXIS
) -> Mesh:
    """2D mesh: batch over `data` x sequence over `time` (data*time devices)."""
    import numpy as np

    devices = np.asarray(jax.devices()[: data * time]).reshape(data, time)
    return Mesh(devices, (data_axis, time_axis))


def time_sharding(
    mesh: Mesh, axis: str = TIME_AXIS, batch_axis: Optional[str] = None
) -> NamedSharding:
    """Shard dim 1 (time) of [B, T, ...] arrays over the time axis (and
    optionally dim 0 over a data axis)."""
    return NamedSharding(mesh, P(batch_axis, axis))


def _identity_filter_elem(B: int, n: int, dtype) -> _FilterElem:
    """Neutral element of `_filter_combine` ([B, ...] leaves, no T axis):
    combine(identity, e) == e == combine(e, identity)."""
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))
    zn = jnp.zeros((B, n), dtype)
    znn = jnp.zeros((B, n, n), dtype)
    return _FilterElem(A=eye, b=zn, C=znn, J=znn, eta=zn)


def _identity_smooth_elem(B: int, n: int, dtype) -> _SmoothElem:
    """Neutral element of `_smooth_combine`: E=I, g=0, L=0."""
    eye = jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n))
    return _SmoothElem(E=eye, g=jnp.zeros((B, n), dtype), L=jnp.zeros((B, n, n), dtype))


def _device_prefix(total, combine, identity, axis: str, reverse: bool = False):
    """EXCLUSIVE prefix (suffix if reverse) of each device's composed element
    across the mesh axis: log2(D) ppermute rounds (Hillis-Steele), then one
    hop to convert inclusive -> exclusive. `total` has [B, ...] leaves."""
    ndev = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)

    def sel(cond, a, b):
        # cond is a traced scalar bool; broadcast select over pytree leaves
        return jax.tree.map(
            lambda x, y: jnp.where(
                jnp.reshape(cond, (1,) * x.ndim), x, y
            ), a, b,
        )

    inclusive = total
    shift = 1
    while shift < ndev:
        if reverse:
            perm = [(i, i - shift) for i in range(shift, ndev)]
            has_in = idx < (ndev - shift)
        else:
            perm = [(i, i + shift) for i in range(ndev - shift)]
            has_in = idx >= shift
        incoming = jax.lax.ppermute(inclusive, axis, perm)
        # devices with no incoming partner got zeros from ppermute; keep own.
        # Both combine conventions put the incoming chunk first:
        #   _filter_combine(earlier, later) with incoming = earlier shards,
        #   _smooth_combine(later, earlier) with incoming = later shards.
        combined = combine(incoming, inclusive)
        inclusive = sel(has_in, combined, inclusive)
        shift *= 2

    # inclusive -> exclusive: take the neighbor's inclusive value, identity at
    # the boundary device
    if reverse:
        perm = [(i, i - 1) for i in range(1, ndev)]
        boundary = idx == (ndev - 1)
    else:
        perm = [(i, i + 1) for i in range(ndev - 1)]
        boundary = idx == 0
    shifted = jax.lax.ppermute(inclusive, axis, perm)
    return sel(boundary, identity, shifted)


def _neighbor_next_slice(x, axis: str):
    """For [B, Tl, ...] x: each device receives the NEXT device's first step
    (x_next[:, 0]); the last device receives zeros. One reverse ppermute hop."""
    ndev = jax.lax.axis_size(axis)
    first = x[:, 0]
    perm = [(i, i - 1) for i in range(1, ndev)]
    return jax.lax.ppermute(first, axis, perm)


def _neighbor_prev_slice(x, axis: str):
    """Each device receives the PREVIOUS device's last step (x_prev[:, -1]);
    device 0 receives zeros."""
    ndev = jax.lax.axis_size(axis)
    last = x[:, -1]
    perm = [(i, i + 1) for i in range(ndev - 1)]
    return jax.lax.ppermute(last, axis, perm)


def _expand(elem, cls):
    """[B, ...] element -> [B, 1, ...] so it broadcasts against [B, Tl, ...]."""
    return cls(*(x[:, None] for x in elem))


def lgssm_smooth_seqpar(
    y: jax.Array,
    u: jax.Array,
    mask: Optional[jax.Array],
    params: LGSSMParams,
    dynamics: SequenceDynamics,
    mesh: Mesh,
    axis: str = TIME_AXIS,
    batch_axis: Optional[str] = None,
) -> SmoothResult:
    """Time-sharded parallel-in-time masked Kalman filter + RTS smoother.

    Inputs are [B, T, ...] with T divisible by the mesh's `axis` size (shard
    them with `time_sharding(mesh)` to avoid an initial reshard). Result
    leaves come back sharded the same way. Numerically equivalent to
    ops/lgssm.lgssm_smooth (gated by tests/test_seqpar.py).

    `batch_axis` additionally shards the batch dim over a second mesh axis
    (2D data x time parallelism: the ppermute rounds run per data-slice; no
    cross-data communication is introduced).
    """
    B, T, p = y.shape
    n = params.mu0.shape[0]
    dtype = y.dtype
    if mask is None:
        mask = jnp.ones((B, T), dtype=dtype)
    mask = mask.astype(dtype)
    if batch_axis is not None:
        B = B // mesh.shape[batch_axis]  # per-shard batch inside the kernel

    spec_bt = P(batch_axis, axis)
    in_specs = (
        spec_bt,                      # y
        spec_bt,                      # u
        spec_bt,                      # mask
        P(),                          # params (replicated)
        jax.tree.map(lambda _: spec_bt, dynamics),
    )
    out_specs = SmoothResult(
        mu_smooth=spec_bt,
        sigma_smooth=spec_bt,
        filter_result=FilterResult(
            mu_filt=spec_bt, sigma_filt=spec_bt,
            mu_pred=spec_bt, sigma_pred=spec_bt,
            A=spec_bt, B=spec_bt, C=spec_bt, Q=spec_bt, aux=None,
        ),
    )

    @partial(
        shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def _sharded(y_l, u_l, mask_l, params_r, dyn_l):
        idx = jax.lax.axis_index(axis)

        # ---- 1. local filtering elements ----
        elems = _generic_filter_elements(y_l, u_l, mask_l, params_r, dyn_l)
        # the GLOBAL first element absorbs the prior; only shard 0 holds it
        first = _prior_first_element(
            y_l[:, 0], mask_l[:, 0],
            einsum("bij,bj->bi", dyn_l.B[:, 0], u_l[:, 0]),
            dyn_l.A[:, 0], dyn_l.C[:, 0], dyn_l.Q[:, 0], params_r,
        )
        is_first = idx == 0
        elems = _FilterElem(*(
            e.at[:, 0].set(
                jnp.where(jnp.reshape(is_first, (1,) * f.ndim), f, e[:, 0])
            )
            for e, f in zip(elems, first)
        ))

        # ---- 2. local inclusive scan + cross-device exclusive prefix ----
        scanned = jax.lax.associative_scan(_filter_combine, elems, axis=1)
        total = _FilterElem(*(x[:, -1] for x in scanned))
        prefix = _device_prefix(
            total, _filter_combine, _identity_filter_elem(B, n, dtype), axis
        )
        combined = _filter_combine(_expand(prefix, _FilterElem), scanned)

        mu_filt = combined.b
        sigma_filt = symmetrize(combined.C)

        # ---- 3. predicted moments (one prev-neighbor hop for m_{t-1}) ----
        F_l, Bm_l, Q_l = dyn_l.A, dyn_l.B, dyn_l.Q
        c_l = einsum("btij,btj->bti", Bm_l, u_l)
        m_prev_in = _neighbor_prev_slice(mu_filt, axis)     # [B,n]
        P_prev_in = _neighbor_prev_slice(sigma_filt, axis)  # [B,n,n]
        m_prior = jnp.broadcast_to(params_r.mu0.astype(dtype), (B, n))
        P_prior = jnp.broadcast_to(params_r.sigma0.astype(dtype), (B, n, n))
        m_first = jnp.where(
            jnp.reshape(is_first, (1, 1)), m_prior, m_prev_in
        )
        P_first = jnp.where(
            jnp.reshape(is_first, (1, 1, 1)), P_prior, P_prev_in
        )
        m_prev = jnp.concatenate([m_first[:, None], mu_filt[:, :-1]], axis=1)
        P_prev = jnp.concatenate([P_first[:, None], sigma_filt[:, :-1]], axis=1)
        mu_pred = einsum("btij,btj->bti", F_l, m_prev) + c_l
        sigma_pred = symmetrize(
            einsum("btij,btjk,btlk->btil", F_l, P_prev, F_l) + Q_l
        )

        fr = FilterResult(
            mu_filt=mu_filt, sigma_filt=sigma_filt,
            mu_pred=mu_pred, sigma_pred=sigma_pred,
            A=dyn_l.A, B=dyn_l.B, C=dyn_l.C, Q=dyn_l.Q, aux=None,
        )

        # ---- 4. smoothing elements (need F, c, sigma_pred at t+1: one
        #         next-neighbor hop) ----
        ndev = jax.lax.axis_size(axis)
        is_last = idx == (ndev - 1)
        F_next_in = _neighbor_next_slice(F_l, axis)              # F at next shard's t0
        c_next_in = _neighbor_next_slice(c_l, axis)
        Pp_next_in = _neighbor_next_slice(sigma_pred, axis)

        F_next = jnp.concatenate([F_l[:, 1:], F_next_in[:, None]], axis=1)
        c_next = jnp.concatenate([c_l[:, 1:], c_next_in[:, None]], axis=1)
        Pp_next = jnp.concatenate(
            [sigma_pred[:, 1:], Pp_next_in[:, None]], axis=1
        )

        PFt = einsum("btij,btkj->btik", sigma_filt, F_next)
        # E_t = P F^T (P_pred,t+1)^{-1}; guard the last shard's final step
        # (its Pp_next slot came from ppermute zeros — make it I, unused)
        safe_Pp = Pp_next.at[:, -1].set(
            jnp.where(
                jnp.reshape(is_last, (1, 1, 1)),
                jnp.broadcast_to(jnp.eye(n, dtype=dtype), (B, n, n)),
                Pp_next[:, -1],
            )
        )
        from kvae_tpu.ops.linalg import solve_small

        E = jnp.swapaxes(
            solve_small(
                jnp.swapaxes(safe_Pp, -1, -2), jnp.swapaxes(PFt, -1, -2)
            ),
            -1, -2,
        )
        g = mu_filt - einsum(
            "btij,btj->bti", E,
            einsum("btij,btj->bti", F_next, mu_filt) + c_next,
        )
        L = symmetrize(
            sigma_filt - einsum("btij,btjk,btlk->btil", E, Pp_next, E)
        )
        # global last element: identity on the filtered posterior at T-1
        E_last = jnp.where(
            jnp.reshape(is_last, (1, 1, 1)),
            jnp.zeros((B, n, n), dtype), E[:, -1],
        )
        g_last = jnp.where(
            jnp.reshape(is_last, (1, 1)), mu_filt[:, -1], g[:, -1]
        )
        L_last = jnp.where(
            jnp.reshape(is_last, (1, 1, 1)), sigma_filt[:, -1], L[:, -1]
        )
        s_elems = _SmoothElem(
            E=E.at[:, -1].set(E_last),
            g=g.at[:, -1].set(g_last),
            L=L.at[:, -1].set(L_last),
        )

        # ---- 5. reverse local scan + cross-device exclusive suffix ----
        s_scanned = jax.lax.associative_scan(
            _smooth_combine, s_elems, axis=1, reverse=True
        )
        s_total = _SmoothElem(*(x[:, 0] for x in s_scanned))
        s_suffix = _device_prefix(
            s_total, _smooth_combine, _identity_smooth_elem(B, n, dtype),
            axis, reverse=True,
        )
        s_combined = _smooth_combine(_expand(s_suffix, _SmoothElem), s_scanned)

        return SmoothResult(
            mu_smooth=s_combined.g,
            sigma_smooth=symmetrize(s_combined.L),
            filter_result=fr,
        )

    return _sharded(y, u, mask, params, dynamics)
