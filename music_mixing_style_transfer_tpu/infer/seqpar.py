"""Sequence-parallel whole-segment conversion: shard TIME over the mesh.

The reference handles long inputs by cutting songs into independent 2^19
segments (``style_transfer.py:274-301``), accepting boundary artifacts from
its 5.2 s receptive field seeing zeros at every cut. This module converts
one arbitrarily long waveform EXACTLY — as if it went through the TCN in a
single forward — by sharding the time axis across the ``data`` mesh and
exchanging per-block conv halos between neighbor chips:

- before block ``n`` (kernel 15, dilation d), every chip sends its edge
  ``7*d`` frames to its neighbors via ``jax.lax.ppermute`` and prepends /
  appends what it receives; chips at the global edges receive ppermute's
  zeros — precisely the zero padding the reference conv uses;
- the unmodified :class:`~..models.tcn.TCNBlock` then runs on the extended
  chunk (its internal SAME zero-pad only pollutes the outer ``7*d`` frames,
  which are cropped), so every kept sample equals the global computation;
- pointwise stages (BN eval affine, LeakyReLU, FiLM, grouped 1x1 residual,
  output 1x1 + clamp) need no exchange.

Cost: the halo frames are the ONLY redundant compute —
``sum_blocks 14*d / (nblocks * T_local)`` ≈ 3% at 2^19 samples/chip —
versus ~44% for input-level halo *recompute* at the full receptive field,
and ~116 MB of edge traffic per chip boundary, which rides ICI in ~1 ms.
This is the TPU-native analogue of context/sequence parallelism for a
convolutional receptive field (SURVEY.md §5.7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..config import TCNConfig
from ..models.tcn import TCNBlock


def _block_plan(cfg: TCNConfig):
    """Static per-block (in_ch, out_ch, dilation)."""
    plan = []
    in_ch = cfg.ninputs
    for n in range(cfg.nblocks):
        out_ch = (
            in_ch * cfg.channel_growth if cfg.channel_growth > 1 else cfg.channel_width
        )
        plan.append((in_ch, out_ch, cfg.dilation_growth ** (n % cfg.stack_size)))
        in_ch = out_ch
    return plan, in_ch


def max_halo(cfg: TCNConfig) -> int:
    plan, _ = _block_plan(cfg)
    return max((cfg.kernel_size - 1) // 2 * d for _, _, d in plan)


def make_seq_parallel_converter(cfg: TCNConfig, mesh, dtype=jnp.float32):
    """Jitted ``fn(conv_vars, x [B, T, 2], cond [B, D]) -> [B, T, 2]`` with
    ``T`` sharded over the mesh's ``data`` axis. Matches a single-device
    ``MixFXcloner.apply`` bit-for-op on every sample."""
    if cfg.causal:
        raise NotImplementedError("sequence-parallel path assumes non-causal TCN")
    n_sh = int(np.prod(mesh.devices.shape))
    plan, _ = _block_plan(cfg)
    fwd = [(i, i + 1) for i in range(n_sh - 1)]
    bwd = [(i + 1, i) for i in range(n_sh - 1)]

    def local_fn(conv_vars, x, cond):
        params = conv_vars["params"]
        stats = conv_vars.get("batch_stats", {})
        h = x.astype(dtype)
        T_loc = h.shape[1]
        for n, (in_ch, out_ch, d) in enumerate(plan):
            halo = (cfg.kernel_size - 1) // 2 * d
            if halo > T_loc and n_sh > 1:
                raise ValueError(
                    f"local chunk {T_loc} shorter than block {n} halo {halo}; "
                    "use fewer shards or longer input"
                )
            if n_sh > 1:
                left = jax.lax.ppermute(h[:, -halo:, :], "data", fwd)
                right = jax.lax.ppermute(h[:, :halo, :], "data", bwd)
                h_ext = jnp.concatenate([left, h, right], axis=1)
            else:
                h_ext = h
            name = f"block{n}"
            block_vars = {"params": params[name]}
            if name in stats:
                block_vars["batch_stats"] = stats[name]
            h_ext = TCNBlock(
                in_ch=in_ch,
                out_ch=out_ch,
                kernel_size=cfg.kernel_size,
                dilation=d,
                cond_dim=cfg.condition_dimension,
                causal=False,
                train=False,
                channels_last=True,
            ).apply(block_vars, h_ext, cond.astype(dtype))
            h = h_ext[:, halo : halo + T_loc, :] if n_sh > 1 else h_ext
        # pointwise output 1x1 + clamp (models/tcn.py:167-178)
        from ..models.blocks import get_conv_precision

        w = params["output_weight"]
        b = params["output_bias"]
        out = jnp.dot(h, w[:, :, 0].T, precision=get_conv_precision()) + b[None, None, :]
        return jnp.clip(out.astype(jnp.float32), -1.0, 1.0)

    rep = P()
    seq = P(None, "data", None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, seq, rep),
        out_specs=seq,
    )
    return jax.jit(fn)


def seq_parallel_convert_device(
    engine, y_in: jnp.ndarray, embs: jnp.ndarray
) -> jnp.ndarray:
    """Device-resident batch variant: ``y_in [S, 2, T]`` float32 (already on
    device), per-row conditioning ``embs [S, D]`` -> ``[S, 2, T]``. Used by
    the PCM fast path under ``InferenceConfig.sequence_parallel``."""
    if engine.mesh is None:
        raise ValueError("sequence-parallel conversion needs a mesh engine")
    cfg = engine.converter_cfg
    n_sh = engine._n_shards
    T = y_in.shape[-1]
    T_loc = max(-(-T // n_sh), max_halo(cfg))
    Tb = T_loc * n_sh
    x = jnp.pad(y_in, ((0, 0), (0, 0), (0, Tb - T)))
    x = jnp.swapaxes(x, -1, -2)  # [S, Tb, 2]
    if getattr(engine, "_seqpar_fn", None) is None:
        engine._seqpar_fn = make_seq_parallel_converter(
            cfg, engine.mesh, dtype=engine.dtype
        )
    x = jax.device_put(x, NamedSharding(engine.mesh, P(None, "data", None)))
    embs = jax.device_put(
        embs.astype(jnp.float32), NamedSharding(engine.mesh, P())
    )
    out = engine._seqpar_fn(engine.conv_vars, x, embs)
    return jnp.swapaxes(out, -1, -2)[:, :, :T]


def convert_seq_parallel(
    engine, audio: np.ndarray, embedding: np.ndarray
) -> np.ndarray:
    """Convert a whole ``[2, T]`` waveform in ONE sequence-sharded forward.

    Unlike :meth:`StyleTransferEngine.convert_song` (independent segments;
    the reference's semantics), the output here is exactly the single-pass
    full-receptive-field conversion — no segment boundaries at all.
    """
    out = seq_parallel_convert_device(
        engine,
        jnp.asarray(audio.astype(np.float32))[None],
        jnp.asarray(embedding.astype(np.float32))[None],
    )
    return np.asarray(out)[0]
