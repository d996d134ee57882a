"""Dynamic range compressor / expander core for TPU.

Re-designs the reference numba envelope follower
(``common_audioeffects.py:529-587``) for XLA. The reference loop is

    x_g = 20*log10(|x|)            (floored at -120 dB below 1e-6)
    y_g = static gain curve        (ratio>1: downward comp; ratio<1: upward exp)
    x_l = x_g - y_g
    y_l[n] = a*y_l[n-1] + (1-a)*x_l[n],  a = a_attack if x_l[n] > y_l[n-1]
                                             else a_release
    y    = x * 10**((makeup - y_l)/20)

Everything except the one-pole smoothing is elementwise (parallel). The
branchy smoothing is reformulated *exactly* as

    y_l[n] = max(a_att*y_l[n-1] + (1-a_att)*x_l[n],
                 a_rel*y_l[n-1] + (1-a_rel)*x_l[n])

valid whenever ``a_att <= a_rel`` (attack time <= release time, true for every
parameterization in the system): when the input is above the envelope both
candidates move up and the attack (faster, smaller a) one is larger; when
below, both move down and the release one is larger. This makes the scan body
branchless — a fused multiply-add + max per step.

Two evaluation strategies:
- ``compressor_gain_exact``: ``lax.scan`` over time (exact, sequential).
- ``compressor_gain_blockwise``: chunk-parallel approximation with warmup
  overlap (envelope memory decays as a^W) for augmentation-grade use.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

LOG10_FLOOR = 1e-6
DB_FLOOR = -120.0


def amp_to_db(x: jnp.ndarray) -> jnp.ndarray:
    """20*log10(|x|) with the reference's -120 dB floor below 1e-6."""
    mag = jnp.abs(x)
    db = 20.0 * jnp.log10(jnp.maximum(mag, LOG10_FLOOR))
    return jnp.where(mag < LOG10_FLOOR, DB_FLOOR, db)


def static_gain_curve(x_g: jnp.ndarray, threshold, ratio) -> jnp.ndarray:
    """Static compression curve in dB domain (reference :564-575).

    ratio > 1: downward compression above threshold.
    ratio < 1: upward expansion below threshold.
    ratio == 1: identity.
    """
    ratio = jnp.asarray(ratio)
    above = x_g >= threshold
    comp = jnp.where(above, threshold + (x_g - threshold) / ratio, x_g)
    below = x_g <= threshold
    expd = jnp.where(below, threshold + (x_g - threshold) * ratio, x_g)
    return jnp.where(ratio > 1.0, comp, jnp.where(ratio < 1.0, expd, x_g))


def alphas(attack_ms, release_ms, sample_rate) -> Tuple[jnp.ndarray, jnp.ndarray]:
    a_att = jnp.exp(-1.0 / (0.001 * sample_rate * attack_ms))
    a_rel = jnp.exp(-1.0 / (0.001 * sample_rate * release_ms))
    return a_att, a_rel


def _envelope_scan(x_l: jnp.ndarray, a_att, a_rel, y0=None) -> jnp.ndarray:
    """Exact envelope smoothing via branchless selection scan.

    ``x_l``: ``[..., T]``; alphas broadcastable to the batch shape. Both
    candidates are convex combinations of (y_prev, x); when attack is
    faster (a_att <= a_rel) the branchy reference always picks the LARGER
    candidate, when slower the smaller — so max/min selected per lane is
    exact for every (attack, release) ordering.
    """
    batch_shape = x_l.shape[:-1]
    a_att = jnp.broadcast_to(jnp.asarray(a_att, x_l.dtype), batch_shape)
    a_rel = jnp.broadcast_to(jnp.asarray(a_rel, x_l.dtype), batch_shape)
    use_max = a_att <= a_rel
    if y0 is None:
        y0 = jnp.zeros(batch_shape, x_l.dtype)

    def step(y_prev, xn):
        cand_att = a_att * y_prev + (1.0 - a_att) * xn
        cand_rel = a_rel * y_prev + (1.0 - a_rel) * xn
        y = jnp.where(
            use_max, jnp.maximum(cand_att, cand_rel), jnp.minimum(cand_att, cand_rel)
        )
        return y, y

    _, y_l = jax.lax.scan(step, y0, jnp.moveaxis(x_l, -1, 0))
    return jnp.moveaxis(y_l, 0, -1)


def _envelope_blockwise(
    x_l: jnp.ndarray, a_att, a_rel, block: int = 4096, warmup: int = 8192
) -> jnp.ndarray:
    """Chunk-parallel approximate envelope: each block is scanned with a
    ``warmup`` prefix from the previous samples (envelope memory decays as
    ``a^warmup``). Trades exactness for T/block-way parallelism — intended
    for randomized augmentation, not for normalization matching."""
    T = x_l.shape[-1]
    nblocks = -(-T // block)
    pad = nblocks * block - T
    xp = jnp.pad(x_l, [(0, 0)] * (x_l.ndim - 1) + [(warmup, pad)], mode="edge")
    # gather [.., nblocks, warmup+block]
    starts = jnp.arange(nblocks) * block
    idx = starts[:, None] + jnp.arange(warmup + block)[None, :]
    blocks = xp[..., idx]  # [..., nblocks, warmup+block]
    a_att_b = jnp.asarray(a_att, x_l.dtype)[..., None] if jnp.ndim(a_att) else a_att
    a_rel_b = jnp.asarray(a_rel, x_l.dtype)[..., None] if jnp.ndim(a_rel) else a_rel
    env = _envelope_scan(blocks, a_att_b, a_rel_b)
    env = env[..., warmup:]
    env = env.reshape(env.shape[:-2] + (nblocks * block,))
    return env[..., :T]


@partial(jax.jit, static_argnames=("sample_rate", "blockwise", "block", "warmup"))
def compressor_process(
    x: jnp.ndarray,
    threshold,
    attack_ms,
    release_ms,
    ratio,
    makeup_db=0.0,
    sample_rate: int = 44100,
    blockwise: bool = False,
    block: int = 4096,
    warmup: int = 8192,
) -> jnp.ndarray:
    """Full compressor (reference ``compressor_process``) over the last axis.

    Parameters may be scalars or arrays broadcastable to ``x.shape[:-1]``
    (vmap-free grid sweeps: pass e.g. ``threshold [G, 1]`` with ``x [1, T]``).
    """
    # parameters follow normal numpy broadcasting against x (e.g. pass
    # threshold [G, 1] with x [G, T] for a grid sweep)
    threshold = jnp.asarray(threshold, x.dtype)
    ratio = jnp.asarray(ratio, x.dtype)
    x_g = amp_to_db(x)
    y_g = static_gain_curve(x_g, threshold, ratio)
    x_l = x_g - y_g
    a_att, a_rel = alphas(attack_ms, release_ms, sample_rate)
    if blockwise:
        y_l = _envelope_blockwise(x_l, a_att, a_rel, block=block, warmup=warmup)
    else:
        y_l = _envelope_scan(x_l, a_att, a_rel)
    c = jnp.power(10.0, (makeup_db - y_l) / 20.0)
    return x * c


def compress_and_clip(
    x2: jnp.ndarray,       # [L, T]
    thresholds: jnp.ndarray,  # [L]
    attacks: jnp.ndarray,  # [L]
    releases: jnp.ndarray, # [L]
    ratios: jnp.ndarray,   # [L]
    sample_rate: int = 44100,
) -> jnp.ndarray:
    """Per-lane compressor + the reference's clip rule (clip only if the
    output exceeds full scale, ``utils_data_normalization.py:352-355``),
    dispatched to the fused Pallas envelope kernel on TPU backends.
    The single home for the backend switch used by the normalization
    matching/batch paths."""
    if jax.default_backend() == "tpu":
        from .pallas.envelope import compressor_pallas

        y = compressor_pallas(
            x2, thresholds, attacks, releases, ratios, sample_rate=sample_rate
        )
    else:
        y = compressor_process(
            x2, thresholds[:, None], attacks, releases, ratios[:, None], 0.0,
            sample_rate=sample_rate,
        )
    return jnp.where(
        jnp.max(jnp.abs(y), axis=-1, keepdims=True) >= 1.0, jnp.clip(y, -1, 1), y
    )


class CompressorStream:
    """Stateful slab-streaming compressor over ``[L, T]`` lanes.

    Feeding consecutive time slabs through :meth:`process` is numerically
    identical to one :func:`compressor_process` pass over the concatenated
    signal — the envelope state carries across slabs. This is the memory-
    bounded building block for whole-song candidate sweeps: the caller never
    materializes ``[L, T]`` for large ``L``, only ``[L, slab]``.

    On TPU backends the fused Pallas kernel runs each slab; elsewhere the
    scan path does. All but the final slab should have a length divisible by
    ``pallas.envelope.TIME_CHUNK`` (the kernel zero-pads ragged tails, which
    decays the carried envelope).
    """

    def __init__(
        self,
        thresholds: jnp.ndarray,  # [L]
        attacks: jnp.ndarray,     # [L] ms
        releases: jnp.ndarray,    # [L] ms
        ratios: jnp.ndarray,      # [L]
        sample_rate: int = 44100,
        interpret: bool | None = None,
    ):
        self.sample_rate = sample_rate
        self._tpu = jax.default_backend() == "tpu" and interpret is not True
        L = int(thresholds.shape[0])
        if self._tpu:
            from .pallas.envelope import pack_lane_params

            self._ppk, self._env = pack_lane_params(
                thresholds, attacks, releases, ratios, (L,), sample_rate
            )
        else:
            self._th = jnp.asarray(thresholds, jnp.float32)[:, None]
            self._ra = jnp.asarray(ratios, jnp.float32)[:, None]
            self._a_att, self._a_rel = alphas(
                jnp.asarray(attacks, jnp.float32),
                jnp.asarray(releases, jnp.float32),
                sample_rate,
            )
            self._env = jnp.zeros((L,), jnp.float32)

    def process(self, x_slab: jnp.ndarray) -> jnp.ndarray:
        """``[L, Ts] -> [L, Ts]`` compressed (no clip), carrying state."""
        if self._tpu:
            from .pallas.envelope import compressor_slab

            y, self._env = compressor_slab(
                x_slab.astype(jnp.float32), self._ppk, self._env
            )
            return y
        y, self._env = _stream_scan_slab(
            x_slab, self._th, self._ra, self._a_att, self._a_rel, self._env
        )
        return y


@jax.jit
def _stream_scan_slab(x_slab, th, ra, a_att, a_rel, env):
    x_g = amp_to_db(x_slab)
    y_g = static_gain_curve(x_g, th, ra)
    y_l = _envelope_scan(x_g - y_g, a_att, a_rel, y0=env)
    return x_slab * jnp.power(10.0, -y_l / 20.0), y_l[:, -1]


# ===========================================================================
# sox-style compander (reference ``fx_utils.py:240-263``, libsox compand)
# ===========================================================================
def compand_transfer_table(
    tf_points=((-70.0, -70.0), (-0.1, -20.0), (0.0, 0.0)),
    soft_knee_db: float = 1.0,
    db_min: float = DB_FLOOR,
    db_step: float = 0.05,
):
    """Dense (in_db -> out_db) lookup table for a compand transfer curve.

    The reference shells out to libsox's ``compand`` (``fx_utils.py:242-250``);
    here the piecewise-linear dB transfer function through ``tf_points`` is
    densified on the host (parameters are static) and the corners smoothed by
    a ``soft_knee_db``-wide boxcar — the moving average of a piecewise-linear
    curve is exactly the piecewise-quadratic soft knee. Returns
    ``(grid_db, out_db)`` float32 numpy arrays for ``jnp.interp``.
    """
    import numpy as np

    pts = np.asarray(sorted(tf_points), dtype=np.float64)
    grid = np.arange(db_min, 0.0 + db_step, db_step)
    # piecewise-linear through the points, unity slope below the first point
    first_in, first_out = pts[0]
    out = np.interp(grid, pts[:, 0], pts[:, 1])
    below = grid < first_in
    out[below] = first_out + (grid[below] - first_in)
    # soft knee: round each interior corner with the standard quadratic
    # blend over radius r = min(knee/2, half of each adjacent segment) —
    # mirroring sox, which shrinks the knee where segments are shorter.
    if soft_knee_db and soft_knee_db > 0:
        knots = np.concatenate([[grid[0]], pts[:, 0]])
        for j in range(1, len(knots) - 1):
            xk = knots[j]
            r = min(
                soft_knee_db / 2.0,
                (xk - knots[j - 1]) / 2.0,
                (knots[j + 1] - xk) / 2.0,
            )
            if r <= db_step:
                continue
            yk = float(np.interp(xk, pts[:, 0], pts[:, 1])) if xk >= first_in else (
                first_out + (xk - first_in)
            )
            # slopes from the piecewise-linear curve just outside the knee
            i_lo = max(0, int(round((xk - r - db_min) / db_step)))
            i_hi = min(len(grid) - 1, int(round((xk + r - db_min) / db_step)))
            s0 = (yk - out[i_lo]) / max(r, db_step)
            s1 = (out[i_hi] - yk) / max(r, db_step)
            mask = (grid >= xk - r) & (grid <= xk + r)
            xx = grid[mask]
            out[mask] = yk + s0 * (xx - xk) + (s1 - s0) / (4.0 * r) * (xx - xk + r) ** 2
    return grid.astype(np.float32), out.astype(np.float32)


@jax.jit
def _compand_apply(x, grid, table, a_att, a_rel):
    # envelope over the channel-max absolute value, shared across channels
    v = jnp.max(jnp.abs(x), axis=-2, keepdims=True)  # [..., 1, T]
    env = _envelope_scan(v, a_att, a_rel)
    env_db = amp_to_db(env)
    out_db = jnp.interp(env_db, grid, table)
    gain = jnp.power(10.0, (out_db - env_db) / 20.0)
    return x * gain


def compand(
    x: jnp.ndarray,
    attack_s: float = 0.001,
    decay_s: float = 0.01,
    tf_points=((-70.0, -70.0), (-0.1, -20.0), (0.0, 0.0)),
    soft_knee_db: float = 1.0,
    sample_rate: int = 44100,
) -> jnp.ndarray:
    """sox-style compander over ``[..., C, T]`` audio (TPU-native stand-in for
    ``soxbindings.Transformer.compand``, reference ``fx_utils.py:242-250``).

    The linear-domain envelope follows the channel-max amplitude with
    attack/decay one-pole smoothing (branchless max-affine scan — valid since
    attack <= decay), then the soft-kneed dB transfer curve is applied as a
    shared gain. Not bit-identical to libsox, but the same response shape.
    """
    if attack_s > decay_s:
        raise ValueError("compand requires attack_s <= decay_s")
    grid, table = compand_transfer_table(tf_points, soft_knee_db)
    a_att = jnp.exp(-1.0 / (sample_rate * attack_s))
    a_rel = jnp.exp(-1.0 / (sample_rate * decay_s))
    return _compand_apply(x, jnp.asarray(grid), jnp.asarray(table), a_att, a_rel)
