"""Pallas TPU kernel: fused compressor envelope follower.

The compressor's one-pole attack/release smoothing is the only genuinely
sequential-in-time op in the system (SURVEY.md §7.3). The ``lax.scan``
version pays XLA while-loop overhead (~0.7 us/step); this kernel runs the
whole recurrence as a tight in-VMEM ``fori_loop`` over (8, 128) lane tiles —
1024 independent channels per grid block — and fuses the elementwise
dB-domain prelude (static gain curve) and epilogue (gain application) so the
audio makes exactly one HBM round trip.

Layout: audio is packed to ``[n_lane_blocks, T, 8, 128]`` (time-major tiles,
lanes in the minor dims). The time axis is chunked by the grid's minor
dimension; the envelope state persists across chunks in a VMEM scratch
(TPU grid iteration is sequential, so the carry is sound).

Exactness: identical recurrence to the reference numba loop
(``common_audioeffects.py:529-587``) in its branchless selection form —
max of the two affine candidates when attack <= release, min when the
attack is slower (see ``ops/compressor.py:_envelope_scan``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK_LANES = LANES * SUBLANES  # 1024 channels per grid block


def _envelope_kernel(
    params_ref,  # [1, 4, 8, 128]  (threshold, ratio, a_att, a_rel) per lane
    env0_ref,    # [1, 8, 128]     initial envelope state (slab carry-in)
    x_ref,       # [1, Tc, 8, 128] audio chunk
    y_ref,       # [1, Tc, 8, 128] output chunk
    envout_ref,  # [1, 8, 128]     final envelope state (slab carry-out)
    state_ref,   # VMEM scratch [8, 128]: envelope carry
):
    t_chunk = pl.program_id(1)

    @pl.when(t_chunk == 0)
    def _():
        state_ref[:, :] = env0_ref[0]

    threshold = params_ref[0, 0]
    ratio = params_ref[0, 1]
    a_att = params_ref[0, 2]
    a_rel = params_ref[0, 3]
    one_m_att = 1.0 - a_att
    one_m_rel = 1.0 - a_rel
    use_max = a_att <= a_rel

    is_comp = ratio > 1.0
    is_exp = ratio < 1.0
    inv_ratio = jnp.where(is_comp, 1.0 / ratio, ratio)

    Tc = x_ref.shape[1]

    # ---- vectorized prelude over the whole chunk (the transcendentals) ----
    # static gain curve: downward compression (ratio>1) above threshold,
    # upward expansion (ratio<1) below threshold. The side-chain reduces to
    #   x_l = x_g - y_g = over * (1 - inv_ratio)   on the curve's active side
    #   x_l = 0                                    elsewhere
    # (identical to the reference's piecewise form, with fewer live temps —
    # the kernel is VMEM-stack-bound at large time chunks). The side-chain is
    # staged IN-PLACE in the output block (no chunk-sized scratch), and the
    # serial loop is left with only 2 FMA + max/min + select per step.
    x = x_ref[0]  # [Tc, 8, 128]
    ax = jnp.abs(x)
    x_g = jnp.where(ax < 1e-6, -120.0, 20.0 * jnp.log10(jnp.maximum(ax, 1e-7)))
    over = x_g - threshold[None]
    # (Mosaic cannot select boolean vectors — keep all select operands f32)
    xlv = over * (1.0 - inv_ratio)[None]
    xl_comp = jnp.where(over >= 0.0, xlv, 0.0)
    xl_exp = jnp.where(over <= 0.0, xlv, 0.0)
    y_ref[0] = jnp.where(
        is_comp[None], xl_comp, jnp.where(is_exp[None], xl_exp, 0.0)
    )

    # ---- serial recurrence: 2 FMA + max/min + select per step ----
    def step(t, y_prev):
        x_l = y_ref[0, t]
        cand_att = a_att * y_prev + one_m_att * x_l
        cand_rel = a_rel * y_prev + one_m_rel * x_l
        y_l = jnp.where(
            use_max, jnp.maximum(cand_att, cand_rel), jnp.minimum(cand_att, cand_rel)
        )
        y_ref[0, t] = y_l  # overwrite side-chain with the smoothed envelope
        return y_l

    state_ref[:, :] = jax.lax.fori_loop(0, Tc, step, state_ref[:, :])

    # ---- vectorized epilogue: gain application ----
    y_ref[0] = x_ref[0] * jnp.exp(-0.11512925464970229 * y_ref[0])  # 10^(-y_l/20)

    # revisited output block: last grid step's write is the slab carry-out
    envout_ref[0] = state_ref[:, :]


@functools.partial(jax.jit, static_argnames=("time_chunk", "interpret"))
def _envelope_pallas_packed(
    x: jnp.ndarray,       # [Lb, T, 8, 128]
    params: jnp.ndarray,  # [Lb, 4, 8, 128]
    env0: jnp.ndarray,    # [Lb, 8, 128]
    time_chunk: int,
    interpret: bool,
):
    Lb, T = x.shape[0], x.shape[1]
    n_chunks = T // time_chunk
    grid = (Lb, n_chunks)
    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        _envelope_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 4, SUBLANES, LANES), lambda i, j: (i, 0, 0, 0), memory_space=mem
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i, j: (i, 0, 0), memory_space=mem
            ),
            pl.BlockSpec(
                (1, time_chunk, SUBLANES, LANES), lambda i, j: (i, j, 0, 0),
                memory_space=mem,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, time_chunk, SUBLANES, LANES), lambda i, j: (i, j, 0, 0),
                memory_space=mem,
            ),
            pl.BlockSpec(
                (1, SUBLANES, LANES), lambda i, j: (i, 0, 0), memory_space=mem
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, jnp.float32),
            jax.ShapeDtypeStruct((Lb, SUBLANES, LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((SUBLANES, LANES), jnp.float32)],
        interpret=interpret,
    )(params, env0, x)


# 256 keeps the kernel's VMEM footprint (double-buffered in/out blocks +
# elementwise prelude temps) under the 16 MB scoped-vmem limit; 512
# measured 17.8M (compile-time OOM)
TIME_CHUNK = 256


def pack_lane_params(
    threshold, attack_ms, release_ms, ratio, batch_shape, sample_rate: int = 44100
):
    """Broadcast + pack per-lane compressor parameters for the kernel.

    Returns ``(ppk [Lb, 4, 8, 128], env0 [Lb, 8, 128])`` with lanes padded to
    a multiple of 1024 (padded lanes get ratio 1 = identity)."""
    from ..compressor import alphas

    L = int(np.prod(batch_shape)) if batch_shape else 1
    a_att, a_rel = alphas(
        jnp.asarray(attack_ms, jnp.float32),
        jnp.asarray(release_ms, jnp.float32),
        sample_rate,
    )
    pvec = [
        jnp.broadcast_to(jnp.asarray(p, jnp.float32), batch_shape).reshape(L)
        for p in (threshold, ratio, a_att, a_rel)
    ]
    Lp = -(-L // BLOCK_LANES) * BLOCK_LANES
    pp = jnp.stack([jnp.pad(p, (0, Lp - L), constant_values=1.0) for p in pvec], axis=0)
    Lb = Lp // BLOCK_LANES
    ppk = pp.reshape(4, Lb, SUBLANES, LANES).transpose(1, 0, 2, 3)
    return ppk, jnp.zeros((Lb, SUBLANES, LANES), jnp.float32)


def compressor_slab(
    xs: jnp.ndarray,   # [L, Ts] float32 (any L <= the packed lane count)
    ppk: jnp.ndarray,  # [Lb, 4, 8, 128] from pack_lane_params
    env: jnp.ndarray,  # [Lb, 8, 128] carry
    time_chunk: int = TIME_CHUNK,
    interpret: bool | None = None,
):
    """One time slab through the envelope kernel; returns ``(y, env')``.

    The carry makes consecutive slabs bit-identical to one full-signal pass.
    ``Ts`` should be a multiple of ``time_chunk`` on all but the final slab
    (tail zero-padding decays the carried envelope toward 0)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L, Ts = xs.shape
    Lb = ppk.shape[0]
    Lp = Lb * BLOCK_LANES
    Tp = -(-Ts // time_chunk) * time_chunk
    xs = jnp.pad(xs.astype(jnp.float32), ((0, Lp - L), (0, Tp - Ts)))
    xpk = xs.reshape(Lb, SUBLANES, LANES, Tp).transpose(0, 3, 1, 2)
    ys, env = _envelope_pallas_packed(xpk, ppk, env, time_chunk, interpret)
    return ys.transpose(0, 2, 3, 1).reshape(Lp, Tp)[:L, :Ts], env


def compressor_pallas(
    x: jnp.ndarray,
    threshold,
    attack_ms,
    release_ms,
    ratio,
    sample_rate: int = 44100,
    time_chunk: int = TIME_CHUNK,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused compressor over the last axis of ``x [..., T]``.

    Parameters broadcast against the batch shape (like
    :func:`..compressor.compressor_process` with makeup 0). Lanes are padded
    to a multiple of 1024 and time to a multiple of ``time_chunk``.
    """
    batch_shape = x.shape[:-1]
    T = x.shape[-1]
    L = int(np.prod(batch_shape)) if batch_shape else 1
    xf = x.reshape(L, T).astype(jnp.float32)

    ppk, env = pack_lane_params(
        threshold, attack_ms, release_ms, ratio, batch_shape, sample_rate
    )
    Lp = ppk.shape[0] * BLOCK_LANES

    # long signals stream through the kernel in time slabs with the envelope
    # state carried between calls (bit-identical to one pass: the recurrence
    # and grid sequencing are unchanged). Without slabbing, the lane padding
    # to BLOCK_LANES materializes [Lp, Tp] in HBM — 2 x 10.6 GB for an
    # 8-channel 60 s sweep (measured OOM); the slab bound keeps the padded
    # in+out buffers near 1 GB regardless of song length.
    slab_T = max(time_chunk, ((1 << 27) // Lp) // time_chunk * time_chunk)
    outs = []
    for s0 in range(0, T, slab_T):
        ys, env = compressor_slab(
            xf[:, s0 : s0 + slab_T], ppk, env, time_chunk, interpret
        )
        outs.append(ys)

    yf = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
    return yf.reshape(batch_shape + (T,)).astype(x.dtype)
