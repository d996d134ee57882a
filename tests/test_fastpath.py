"""Batched fast-path augmentation (fx/fastpath.py) vs the generic chain walk.

The fast path is a pure evaluation-strategy change (same key routing, same
per-draw math, instruments batched) — these tests pin equivalence against
the per-instrument vmap loop at float32 fusion-order tolerance, plus the
structural split/merge behaviors (drums' divergent reverb stage, per-group
baked probabilities, unsupported-topology fallback).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from music_mixing_style_transfer_tpu.fx import make_instrument_manipulators
from music_mixing_style_transfer_tpu.fx.chain import AugmentationChain, Stage
from music_mixing_style_transfer_tpu.fx.factory import (
    create_effects_augmentation_chain,
)
from music_mixing_style_transfer_tpu.fx.fastpath import (
    eval_grouped,
    eval_manipulators_batched,
)
from music_mixing_style_transfer_tpu.train.fused import (
    augment_contrastive_views,
    augment_triplets,
)

INSTS = ("drums", "bass", "other", "vocals")
L = 16384
PAD = 2048


def _segs(rng, n_inst=4, B=2):
    return jnp.asarray(
        rng.standard_normal((n_inst, B, 2, 2, L)).astype(np.float32) * 0.1
    )


def _keys(seed, *shape):
    n = int(np.prod(shape))
    return jnp.asarray(jax.random.split(jax.random.PRNGKey(seed), n)).reshape(
        *shape, 2
    )


@pytest.mark.parametrize("with_probs", [False, True])
def test_contrastive_fast_matches_generic(rng, with_probs):
    man = make_instrument_manipulators()
    segs, keys = _segs(rng), _keys(0, 4, 2, 2)
    probs = (
        {k: jnp.float32(v) for k, v in
         {"eq": 0.9, "comp": 0.85, "pan": 0.3, "imager": 0.8, "gain": 0.5}.items()}
        if with_probs
        else None
    )
    a1, b1 = augment_contrastive_views(man, INSTS, segs, keys, PAD, probs, fast=False)
    a2, b2 = augment_contrastive_views(man, INSTS, segs, keys, PAD, probs, fast=True)
    np.testing.assert_allclose(a1, a2, atol=2e-5)
    np.testing.assert_allclose(b1, b2, atol=2e-5)


def test_triplets_fast_matches_generic(rng):
    man = make_instrument_manipulators()
    segs, keys = _segs(rng), _keys(7, 4, 2)
    slow = augment_triplets(man, INSTS, segs, keys, PAD, L - 2 * PAD, fast=False)
    fastr = augment_triplets(man, INSTS, segs, keys, PAD, L - 2 * PAD, fast=True)
    for s, f in zip(slow, fastr):
        np.testing.assert_allclose(s, f, atol=2e-5)


def test_baked_prob_vector_merges_groups(rng):
    """bass/other/vocals chains differ ONLY in baked reverb probability —
    the fast path must merge them into one evaluation and still reproduce
    each group's own gate decisions."""
    man = make_instrument_manipulators(reverb_prob={"bass": 0.0, "other": 1.0, "vocals": 0.35})
    segs, keys = _segs(rng), _keys(3, 4, 2, 2)
    a1, b1 = augment_contrastive_views(man, INSTS, segs, keys, PAD, None, fast=False)
    a2, b2 = augment_contrastive_views(man, INSTS, segs, keys, PAD, None, fast=True)
    np.testing.assert_allclose(a1, a2, atol=2e-5)
    np.testing.assert_allclose(b1, b2, atol=2e-5)


def test_unsupported_topology_falls_back_to_generic(rng):
    """A 3-stage shuffled chain has no batched strategy — eval_grouped must
    still produce the generic chain's output via the per-draw vmap net."""
    chain = AugmentationChain(
        [Stage(p, 0.9) for p in (
            create_effects_augmentation_chain(["gain"]).stages[0].fx,
            create_effects_augmentation_chain(["pan"]).stages[0].fx,
            create_effects_augmentation_chain(["imager"]).stages[0].fx,
        )],
        shuffle=True,
    )
    x = jnp.asarray(rng.standard_normal((6, 2, 2, 4096)).astype(np.float32) * 0.1)
    keys = _keys(11, 6)
    want = jax.vmap(lambda k, xi: chain(k, xi))(keys, x)
    got = eval_grouped([chain], [6], keys, x, None)
    np.testing.assert_allclose(want, got, atol=1e-6)


def test_structurally_divergent_groups_split_and_concat(rng):
    """Adjacent groups with different chain structures evaluate on their own
    draw slices; outputs re-concatenate in draw order."""
    c_a = create_effects_augmentation_chain([("gain", 0.8)])
    c_b = create_effects_augmentation_chain([("pan", 0.6), ("imager", 0.9)])
    x = jnp.asarray(rng.standard_normal((6, 2, 2, 4096)).astype(np.float32) * 0.1)
    keys = _keys(13, 6)
    got = eval_grouped([c_a, c_b], [2, 4], keys, x, None)
    want_a = jax.vmap(lambda k, xi: c_a(k, xi))(keys[:2], x[:2])
    want_b = jax.vmap(lambda k, xi: c_b(k, xi))(keys[2:], x[2:])
    np.testing.assert_allclose(got[:2], want_a, atol=1e-6)
    np.testing.assert_allclose(got[2:], want_b, atol=1e-6)


def test_entry_point_shape_guard():
    man = make_instrument_manipulators()
    x = jnp.zeros((5, 2, 2, 4096), jnp.float32)
    with pytest.raises(ValueError, match="draw batch"):
        eval_manipulators_batched(man, INSTS, _keys(1, 5), x, 2)
