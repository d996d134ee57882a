"""FX processor and augmentation-chain behavior tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from music_mixing_style_transfer_tpu.fx import (
    AlgorithmicReverb,
    AugmentationChain,
    Compressor,
    ConvolutionalReverb,
    Distortion,
    Equaliser,
    Gain,
    Haas,
    MidSideImager,
    Monauralize,
    Panner,
    Stage,
    SwapChannels,
    create_inst_effects_augmentation_chain,
    make_instrument_manipulators,
)

KEY = jax.random.PRNGKey(42)
T = 8192


@pytest.fixture
def stereo(rng):
    return jnp.asarray((rng.standard_normal((2, T)) * 0.2).astype(np.float32))


def test_gain_applies_db(stereo):
    g = Gain()
    p = {"gain_db": jnp.asarray(6.0), "invert": jnp.asarray(False)}
    y = g.apply(p, stereo)
    np.testing.assert_allclose(np.asarray(y), np.asarray(stereo) * 10 ** (6 / 20), rtol=1e-5)


def test_panner_laws(stereo):
    pan = Panner()
    for law in range(3):
        p = {"pan": jnp.asarray(0.5), "law": jnp.asarray(law)}
        g = np.asarray(Panner.gains(p["pan"], p["law"]))
        assert abs(g[0] - g[1]) < 1e-5  # center pan is symmetric
    p = {"pan": jnp.asarray(0.0), "law": jnp.asarray(1)}  # hard left, linear
    y = np.asarray(pan.apply(p, stereo))
    assert np.allclose(y[1], 0.0)


def test_imager_widens_and_narrows(stereo):
    im = MidSideImager()
    x = np.asarray(stereo)

    def side_ratio(a):
        mid, side = a[0] + a[1], a[0] - a[1]
        return np.sum(side**2) / (np.sum(mid**2) + np.sum(side**2))

    narrow = np.asarray(im.apply({"bal": jnp.asarray(0.2)}, stereo))
    wide = np.asarray(im.apply({"bal": jnp.asarray(1.8)}, stereo))
    assert side_ratio(narrow) < side_ratio(x) < side_ratio(wide)


def test_haas_stereoizes_mono(rng):
    mono = np.tile((rng.standard_normal((1, T)) * 0.2).astype(np.float32), (2, 1))
    h = Haas()
    p = {"delay": jnp.asarray(800), "feedback": jnp.asarray(0.5), "left": jnp.asarray(True)}
    y = np.asarray(h.apply(p, jnp.asarray(mono)))
    side = y[0] - y[1]
    assert np.sum(side**2) > 1e-3


def test_swap_and_mono(stereo):
    y = np.asarray(SwapChannels().apply({"swap": jnp.asarray(True)}, stereo))
    np.testing.assert_allclose(y[0], np.asarray(stereo)[1])
    m = np.asarray(Monauralize().apply({"seed_right": jnp.asarray(False)}, stereo))
    np.testing.assert_allclose(m[0], m[1])


def test_distortion_modes(stereo):
    d = Distortion()
    for mode in range(5):  # hard_clip, overdrive, soft_sine, tanh, bit_crusher
        p = {
            "mode": jnp.asarray(mode),
            "threshold_db": jnp.asarray(-10.0),
            "drive_db": jnp.asarray(10.0),
            "colour": jnp.asarray(20.0),
            "bits": jnp.asarray(8),
        }
        y = np.asarray(d.apply(p, stereo))
        assert np.isfinite(y).all()
        assert y.shape == stereo.shape


def test_distortion_overdrive_blocks_dc(stereo):
    """The overdrive colour offset must not leak DC into the output."""
    d = Distortion()
    p = {
        "mode": jnp.asarray(1),
        "threshold_db": jnp.asarray(0.0),
        "drive_db": jnp.asarray(12.0),
        "colour": jnp.asarray(80.0),
        "bits": jnp.asarray(8),
    }
    y = np.asarray(d.apply(p, stereo))
    # one-pole DC blocker (r=0.995) leaves only a small transient-mean
    assert abs(float(np.mean(y))) < 0.01
    assert np.isfinite(y).all()


def test_equaliser_shapes_spectrum(rng):
    """A +15 dB boost at 2 kHz should raise 2 kHz energy vs neighbors."""
    sr = 44100
    t = np.arange(sr) / sr
    x = np.stack([np.sin(2 * np.pi * 2000 * t), np.sin(2 * np.pi * 200 * t)]).astype(np.float32) * 0.1
    eq = Equaliser(sample_rate=sr, bands=("second_band",), fixed_params={
        "second_band_gain": 15.0, "second_band_freq": 2000.0, "second_band_q": 0.7,
    })
    p = eq.sample(KEY)
    y = np.asarray(eq.apply(p, jnp.asarray(x)))
    gain_2k = np.sqrt(np.mean(y[0] ** 2) / np.mean(x[0] ** 2))
    gain_200 = np.sqrt(np.mean(y[1] ** 2) / np.mean(x[1] ** 2))
    assert gain_2k > 3.0  # ~15 dB = 5.6x
    assert gain_200 < 1.5


def test_compressor_reduces_dynamic_range(rng):
    x = (rng.standard_normal((2, T)) * 0.5).astype(np.float32)
    x[:, : T // 2] *= 0.05  # quiet half
    comp = Compressor()
    p = {
        "threshold": jnp.asarray(-20.0),
        "attack_ms": jnp.asarray(2.0),
        "release_ms": jnp.asarray(100.0),
        "ratio": jnp.asarray(8.0),
    }
    y = np.asarray(comp.apply(p, jnp.asarray(x)))

    # loud half (-6 dBFS rms, above the -20 dB threshold) is driven toward the
    # static curve -20 + 14/8 = -18.25 dB; quiet half (below threshold) is
    # untouched
    loud_rms = np.sqrt(np.mean(y[:, T // 2 :] ** 2))
    assert 0.07 < loud_rms < 0.16
    np.testing.assert_allclose(
        y[:, : T // 2], x[:, : T // 2], atol=2e-4
    )


def test_algorithmic_reverb_adds_tail(rng):
    x = np.zeros((2, 2 * 44100), np.float32)
    x[:, 1000] = 1.0  # impulse
    rv = AlgorithmicReverb()
    p = {
        "room_size": jnp.asarray(0.7),
        "damping": jnp.asarray(0.2),
        "dry_mix": jnp.asarray(0.0),
        "wet_mix": jnp.asarray(1.0),
        "width": jnp.asarray(0.7),
    }
    y = np.asarray(rv.apply(p, jnp.asarray(x)))
    # energy well after the impulse -> reverb tail exists
    tail = y[:, 30000:60000]
    assert np.sqrt(np.mean(tail**2)) > 1e-5
    assert np.isfinite(y).all()


def test_convolutional_reverb(rng):
    ir = np.zeros((3, 2, 2000), np.float32)
    ir[:, :, 0] = 1.0
    ir[1, :, 500] = 0.5  # echo at 500 samples for IR #1
    rv = ConvolutionalReverb(ir)
    x = (rng.standard_normal((2, 4000)) * 0.2).astype(np.float32)
    y = np.asarray(rv.apply({"index": jnp.asarray(1)}, jnp.asarray(x)))
    expected = x + 0.5 * np.pad(x, ((0, 0), (500, 0)))[:, :4000]
    np.testing.assert_allclose(y, expected, atol=1e-3)


def test_chain_same_fx_creates_positive_pairs(rng):
    """The same sampled FX must be applied to every item in the stack
    (this is what makes contrastive positives)."""
    gain = Gain()
    chain = AugmentationChain([Stage(gain, 1.0, False)])
    x = jnp.asarray((rng.standard_normal((2, 2, T)) * 0.2).astype(np.float32))
    y = np.asarray(chain(KEY, x))
    ratio0 = y[0] / np.asarray(x)[0]
    ratio1 = y[1] / np.asarray(x)[1]
    np.testing.assert_allclose(ratio0, ratio1, rtol=1e-4)


def test_chain_probability_gate(rng):
    gain = Gain(gain_range=(9.0, 9.0))
    x = jnp.asarray((rng.standard_normal((1, 2, 512)) * 0.2).astype(np.float32))
    chain_never = AugmentationChain([Stage(gain, 0.0, False)])
    y = np.asarray(chain_never(KEY, x))
    np.testing.assert_allclose(y, np.asarray(x))

    chain_always = AugmentationChain([Stage(gain, 1.0, False)])
    y2 = np.asarray(chain_always(KEY, x))
    assert not np.allclose(y2, np.asarray(x))


def test_chain_parallel_mix(rng):
    gain = Gain(gain_range=(-120.0, -120.0))  # wet path silent
    chain = AugmentationChain(
        [Stage(gain, 1.0, False)], parallel=True, parallel_weight_factor=0.5
    )
    x = jnp.asarray((rng.standard_normal((1, 2, 512)) * 0.2).astype(np.float32))
    y = np.asarray(chain(KEY, x))
    np.testing.assert_allclose(y, 0.5 * np.asarray(x), atol=1e-5)


def test_instrument_chain_compiles_and_runs(rng):
    """Full per-instrument chain (eq+comp / pan+imager / reverb / gain)
    traces to one jitted program and runs."""
    chain = create_inst_effects_augmentation_chain("vocals")
    x = jnp.asarray((rng.standard_normal((2, 2, 2**14)) * 0.2).astype(np.float32))
    f = jax.jit(chain)
    y = np.asarray(f(KEY, x))
    assert y.shape == x.shape
    assert np.isfinite(y).all()
    # different keys -> different effects
    y2 = np.asarray(f(jax.random.PRNGKey(7), x))
    assert not np.allclose(y, y2)


def test_drums_chain_differs(rng):
    mans = make_instrument_manipulators(instruments=("drums", "bass"))
    x = jnp.asarray((rng.standard_normal((1, 2, 2**13)) * 0.2).astype(np.float32))
    for inst, chain in mans.items():
        y = np.asarray(jax.jit(chain)(KEY, x))
        assert np.isfinite(y).all()


def test_reverb_send_chain(rng):
    from music_mixing_style_transfer_tpu.fx.factory import create_reverb_send_chain

    chain = create_reverb_send_chain(low_shelf_gain_db=-50.0, parallel=True)
    x = jnp.asarray((rng.standard_normal((1, 2, 2**14)) * 0.2).astype(np.float32))
    y = np.asarray(chain(KEY, x))
    assert y.shape == x.shape
    assert np.isfinite(y).all()


def test_prep_fades_and_trim(rng):
    from music_mixing_style_transfer_tpu.data.prep import fade_in, fade_out, random_trim

    x = np.ones((2, 1000), np.float32)
    fi = fade_in(x, 100)
    fo = fade_out(x, 100)
    assert fi[0, 0] < 0.05 and fi[0, -1] == 1.0
    assert fo[0, 0] == 1.0 and fo[0, -1] < 0.05
    t = random_trim(np.arange(10, dtype=np.float32), 25, np.random.default_rng(0))
    assert t.shape == (25,)  # wraparound for short inputs


def test_chain_dynamic_probs_match_static():
    """A chain called with a `probs` dict equals a chain REBUILT with those
    probabilities baked in — bit-identical (the bernoulli gates consume the
    same uniform bits either way). This is what lets probability scheduling
    reuse one compiled executable (fx/chain.py Stage.prob_name)."""
    import jax
    import jax.numpy as jnp

    from music_mixing_style_transfer_tpu.fx import make_instrument_manipulators

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 2, 8192)).astype(np.float32) * 0.2)
    key = jax.random.PRNGKey(11)
    sched = {"eq": 0.55, "comp": 0.35, "pan": 0.8, "imager": 0.15, "gain": 0.95}

    for inst in ("drums", "vocals"):  # drums has the scaled dual-band reverb
        base = make_instrument_manipulators((inst,))[inst]
        baked = make_instrument_manipulators((inst,), apply_prob_dict=sched)[inst]
        y_dyn = jax.jit(lambda k, v, p: base(k, v, p))(
            key, x, {k: jnp.float32(v) for k, v in sched.items()}
        )
        y_baked = jax.jit(lambda k, v: baked(k, v))(key, x)
        np.testing.assert_array_equal(np.asarray(y_dyn), np.asarray(y_baked))
        # and a DIFFERENT schedule point through the same dynamic callable
        # actually changes the output (the gates are live, not baked)
        y_dyn2 = jax.jit(lambda k, v, p: base(k, v, p))(
            key, x, {k: jnp.float32(0.0) for k in sched}
        )
        assert not np.array_equal(np.asarray(y_dyn), np.asarray(y_dyn2))
