"""Training datasets: MUSDB-style FX-manipulated pair/triplet sampling.

TPU re-design of the reference data loaders (``data_loader/data_loader.py``):
the reference manipulates audio per-sample inside CPU DataLoader workers;
here the host only reads raw WAV segments — ALL effects run batched on
device via the jittable FX chains (``fx/``), which is both faster and exactly
reproducible from PRNG keys.

- :class:`ContrastivePairDataset` (reference
  ``MUSDB_Dataset_Mixing_Manipulated_FXencoder`` :115-348): two segments
  (A, B) of different content per instrument; ``num_strong_negatives+1``
  independent FX draws applied to the SAME (A, B) pair produce positives
  (A_k, B_k) and strong negatives (A_j, B_j, j != k).
- :class:`StyleTransferTripletDataset` (reference
  ``MUSDB_Dataset_Mixing_Manipulated_Style_Transfer`` :356-539): triplets
  (A1 raw input, A2 ground truth, B2 reference) with the same FX on A2/B2.
- random-duration collate (reference
  ``Collate_Variable_Length_Segments`` :33-102): crop lengths are sampled in
  [L/2, L) shared per batch and bucketed to multiples of 4096 so XLA sees a
  small, finite set of shapes.
- val-mode determinism: per-index fixed seeds + on-disk WAV caching of
  manipulated segments (reference :202-220).
"""
from __future__ import annotations

import functools
import glob as globlib
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fx import make_instrument_manipulators
from .native_loader import open_wav_bank
from .wavio import read_wav, wav_length, write_wav

PAD_B4_MANIPULATION = 2048  # reference data_loader.py:127

def _bucket_length(n: int, quantum: int = 4096) -> int:
    return max(quantum, (n // quantum) * quantum)


@functools.lru_cache(maxsize=16)
def _split_fn(n: int):
    return jax.jit(jax.vmap(lambda k: jax.random.split(k, n)))


def host_split_keys(seeds: Sequence[int], n: int) -> np.ndarray:
    """``[jax.random.split(jax.random.PRNGKey(s), n) for s in seeds]`` as one
    batched dispatch, returned to host: ``[len(seeds), n, 2]`` uint32.

    The seed->key packing replicates ``threefry_seed`` for the live config —
    with x64 disabled (this codebase's world) ``PRNGKey`` keeps only the low
    32 bits of the seed; with x64 it packs hi/lo words — asserted against
    ``PRNGKey`` in tests/test_fused_train.py. Non-negative seeds only
    (negative Python ints take PRNGKey's int32 path, which packs
    differently; no caller here produces them). Feeds the fused train path
    (train/fused.py): the host ships raw FX keys with the raw segments so
    manipulation can run inside the step."""
    if any(s < 0 for s in seeds):
        raise ValueError("host_split_keys requires non-negative seeds")
    s64 = np.asarray(seeds, np.int64).view(np.uint64)
    hi = (
        (s64 >> np.uint64(32))
        if jax.config.jax_enable_x64
        else np.zeros_like(s64)
    )
    keydata = np.stack([hi, s64 & np.uint64(0xFFFFFFFF)], -1)
    return np.asarray(_split_fn(n)(keydata.astype(np.uint32)))


def to_transport(segs: np.ndarray, transport: str = "auto") -> np.ndarray:
    """Quantize float32 segments to int16 for the host->device hop when that
    is lossless (sources read from 16-bit PCM are exactly ``pcm/32768``);
    ``auto`` verifies the round-trip and keeps float32 otherwise."""
    if transport == "float32":
        return segs
    q = np.clip(np.round(segs * 32768.0), -32768, 32767).astype(np.int16)
    if transport == "int16":
        return q
    if transport != "auto":
        raise ValueError(f"unknown transport {transport!r}")
    exact = np.array_equal(q.astype(np.float32) * (1.0 / 32768.0), segs)
    return q if exact else segs


class _MUSDBFiles:
    """Per-instrument file lists with duration-ratio sampling weights
    (reference ``data_loader.py:135-146``).

    Segment IO goes through the native C++ wav bank (``cpp/mstio.cc``:
    header parse once, pread + thread pool per batch) when the library is
    available, with a pure-Python ``wavio`` fallback — outputs are identical
    (tests/test_native.py)."""

    def __init__(
        self,
        data_dir: str,
        instruments: Sequence[str],
        use_normalized: bool = True,
        normalization_order: str = "eqcompimagegain",
        use_native: bool = True,
        sample_rate: int = 44100,
    ):
        self.paths: Dict[str, List[str]] = {}
        self.weights: Dict[str, np.ndarray] = {}
        self.lengths: Dict[str, List[int]] = {}
        self.banks: Dict[str, object] = {}
        for inst in instruments:
            if use_normalized:
                pattern = f"{data_dir}/{inst}_normalized_{normalization_order}_silence_trimmed*.wav"
            else:
                pattern = f"{data_dir}/{inst}_silence_trimmed*.wav"
            paths = sorted(globlib.glob(pattern))
            if not paths:
                raise FileNotFoundError(f"no files match {pattern}")
            bank = open_wav_bank(paths) if use_native else None
            if bank is not None and sample_rate is not None:
                # same contract as the wavio fallback, which raises per-read
                for p, rate in zip(paths, bank.rates):
                    if rate != sample_rate:
                        raise ValueError(f"{p}: sample rate {rate} != expected {sample_rate}")
            lengths = bank.frames if bank is not None else [wav_length(p) for p in paths]
            total = sum(lengths)
            self.paths[inst] = paths
            self.lengths[inst] = list(lengths)
            self.weights[inst] = np.asarray(lengths, np.float64) / total
            if bank is not None:
                self.banks[inst] = bank

    def sample_segments(
        self, rng: np.random.Generator, inst: str, n: int, duration: int
    ) -> np.ndarray:
        """Load ``n`` random segments ``[n, 2, duration]`` (length-weighted
        file choice, random start)."""
        idxs = rng.choice(len(self.paths[inst]), size=n, p=self.weights[inst])
        starts = [
            int(rng.integers(0, max(self.lengths[inst][fi] - duration, 1)))
            if self.lengths[inst][fi] > duration
            else 0
            for fi in idxs
        ]
        bank = self.banks.get(inst)
        if bank is not None:
            return bank.read_segments(idxs, starts, duration)
        out = np.zeros((n, 2, duration), np.float32)
        for i, (fi, start) in enumerate(zip(idxs, starts)):
            path = self.paths[inst][fi]
            seg, _ = read_wav(path, start=start, duration=min(duration, self.lengths[inst][fi]))
            seg = seg.T[:2] if seg.shape[1] >= 2 else np.repeat(seg.T, 2, 0)
            out[i, :, : seg.shape[-1]] = seg  # zero-pad files shorter than duration
        return out


class ContrastivePairDataset:
    """FXencoder contrastive data: per-instrument manipulated (A, B) views."""

    def __init__(
        self,
        data_dir: str,
        mode: str = "train",
        instruments: Sequence[str] = ("drums", "bass", "other", "vocals"),
        segment_length: int = 2**17,
        num_strong_negatives: int = 1,
        apply_prob_dict: Optional[Dict[str, float]] = None,
        reverb_prob: Optional[Dict[str, float]] = None,
        ir_bank: Optional[np.ndarray] = None,
        use_normalized: bool = True,
        normalization_order: str = "eqcompimagegain",
        fixed_random_seed: int = 777,
        val_cache_dir: Optional[str] = None,
        sample_rate: int = 44100,
        pad_b4_manipulation: bool = True,
    ):
        self.files = _MUSDBFiles(
            os.path.join(data_dir, mode), instruments, use_normalized,
            normalization_order, sample_rate=sample_rate,
        )
        self.mode = mode
        self.instruments = tuple(instruments)
        self.segment_length = segment_length
        self.num_strong_negatives = num_strong_negatives
        self.fixed_random_seed = fixed_random_seed
        self.val_cache_dir = val_cache_dir
        self.sample_rate = sample_rate
        self.pad = PAD_B4_MANIPULATION if pad_b4_manipulation else 0

        self.manipulators = make_instrument_manipulators(
            instruments, apply_prob_dict, reverb_prob, ir_bank, sample_rate
        )
        self._jitted = {
            inst: jax.jit(jax.vmap(chain, in_axes=(0, 0)))
            for inst, chain in self.manipulators.items()
        }

    # ------------------------------------------------------------------
    def _rng_for(self, idx: int, epoch_seed: Optional[int]) -> np.random.Generator:
        if self.mode == "train":
            base = np.random.SeedSequence([epoch_seed or 0, idx])
            return np.random.default_rng(base)
        return np.random.default_rng(idx * self.fixed_random_seed)

    def _seed_for(self, idx: int, epoch_seed: Optional[int]) -> int:
        if self.mode == "train":
            return (epoch_seed or 0) * 1_000_003 + idx
        return idx * self.fixed_random_seed

    def _keys_for(self, idx: int, epoch_seed: Optional[int], n: int) -> jax.Array:
        return jax.random.split(jax.random.PRNGKey(self._seed_for(idx, epoch_seed)), n)

    # ------------------------------------------------------------------
    def sample_batch(
        self, indices: Sequence[int], epoch_seed: Optional[int] = None
    ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
        """Produce a batch of manipulated views.

        Returns two dicts (A, B): ``inst -> [B*(negs+1), 2, L]`` — layout
        matching the reference collate output (views of one item are
        adjacent).
        """
        K = self.num_strong_negatives + 1
        load_len = self.segment_length + 2 * self.pad
        out_a: Dict[str, List[np.ndarray]] = {i: [] for i in self.instruments}
        out_b: Dict[str, List[np.ndarray]] = {i: [] for i in self.instruments}

        for idx in indices:
            cached = self._load_val_cache(idx)
            if cached is not None:
                for inst in self.instruments:
                    for k in range(K):
                        a, b = cached[inst][k]
                        out_a[inst].append(a)
                        out_b[inst].append(b)
                continue

            rng = self._rng_for(idx, epoch_seed)
            keys = self._keys_for(idx, epoch_seed, K * len(self.instruments))
            cache: Dict[str, List[Tuple[np.ndarray, np.ndarray]]] = {}
            for ii, inst in enumerate(self.instruments):
                segs = self.files.sample_segments(rng, inst, 2, load_len)
                pair = jnp.asarray(segs)  # [2, 2, L+pad]
                pair_k = jnp.broadcast_to(pair[None], (K,) + pair.shape)
                manipulated = np.asarray(
                    self._jitted[inst](keys[ii * K : (ii + 1) * K], pair_k)
                )  # [K, 2, 2, L+pad]
                if self.pad:
                    manipulated = manipulated[..., self.pad : -self.pad]
                manipulated = np.clip(manipulated, -1.0, 1.0)
                cache[inst] = []
                for k in range(K):
                    out_a[inst].append(manipulated[k, 0])
                    out_b[inst].append(manipulated[k, 1])
                    cache[inst].append((manipulated[k, 0], manipulated[k, 1]))
            self._save_val_cache(idx, cache)

        return (
            {i: np.stack(v) for i, v in out_a.items()},
            {i: np.stack(v) for i, v in out_b.items()},
        )

    # ------------------------------------------------------------------
    def batch_keys(
        self, indices: Sequence[int], epoch_seed: Optional[int] = None
    ) -> np.ndarray:
        """FX PRNG keys for ``indices`` as ONE batched device dispatch:
        ``[n_inst, B, K, 2] uint32``. An epoch's worth can be precomputed
        up front (``batch_keys(all_indices)`` then sliced per step along
        axis 1) — per-step key dispatches otherwise queue behind the
        in-flight augment/train work on the chip and serialize the host
        input pipeline (measured ~1 s/batch over the serving tunnel)."""
        K = self.num_strong_negatives + 1
        n_inst = len(self.instruments)
        seeds = [self._seed_for(idx, epoch_seed) for idx in indices]
        keys = host_split_keys(seeds, K * n_inst)  # [B, K*n_inst, 2]
        keys = keys.reshape(len(indices), n_inst, K, 2).transpose(1, 0, 2, 3)
        return np.ascontiguousarray(keys)

    def sample_raw_batch(
        self,
        indices: Sequence[int],
        epoch_seed: Optional[int] = None,
        transport: str = "auto",
        keys: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host side of the fused train path (``train/fused.py``): raw
        segments + FX PRNG keys, NO device work and no manipulated-audio
        round trip. Same rng/key consumption order as :meth:`sample_batch`,
        so the fused on-device augmentation reproduces it exactly
        (tests/test_fused_train.py).

        ``keys``: precomputed :meth:`batch_keys` output for ``indices``
        (skips the per-batch key dispatch — see there).

        Returns ``(segs [n_inst, B, 2(content A/B), 2(ch), L_load]``
        (int16 when losslessly quantizable, else float32),
        ``keys [n_inst, B, K, 2] uint32)``.
        """
        load_len = self.segment_length + 2 * self.pad
        n_inst, B = len(self.instruments), len(indices)
        segs = np.zeros((n_inst, B, 2, 2, load_len), np.float32)
        for j, idx in enumerate(indices):
            rng = self._rng_for(idx, epoch_seed)
            for ii in range(n_inst):
                segs[ii, j] = self.files.sample_segments(
                    rng, self.instruments[ii], 2, load_len
                )
        if keys is None:
            keys = self.batch_keys(indices, epoch_seed)
        return to_transport(segs, transport), keys

    def collate_plan(
        self,
        n_items: int,
        rng: np.random.Generator,
        quantum: Optional[int] = None,
    ) -> Tuple[int, int, np.ndarray, np.ndarray]:
        """The (la, lb, sa, sb) draw of :meth:`collate_random_duration`
        without touching audio — the fused path crops on device. Consumes
        ``rng`` in the identical order, so legacy and fused runs see the
        same crop plan."""
        L = self.segment_length
        if quantum is None:
            quantum = max(4096, L // 8)
        la = _bucket_length(int(rng.integers(L // 2, L)), quantum)
        lb = _bucket_length(int(rng.integers(L // 2, L)), quantum)
        sa = np.array(
            [int(rng.integers(0, L - la + 1)) for _ in range(n_items)], np.int32
        )
        sb = np.array(
            [int(rng.integers(0, L - lb + 1)) for _ in range(n_items)], np.int32
        )
        return la, lb, sa, sb

    # ------------------------------------------------------------------
    def collate_random_duration(
        self,
        batch_a: Dict[str, np.ndarray],
        batch_b: Dict[str, np.ndarray],
        rng: np.random.Generator,
        quantum: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Random-duration crop shared across the batch (reference collate
        :46-75), bucketed for shape stability.

        The A and B durations are drawn independently like the reference's
        (``data_loader.py:51``), then bucketed to ``quantum`` (default
        ``max(4096, L//8)``) so the jitted train step sees at most ~25
        distinct ``(La, Lb)`` shape pairs per segment length — each new pair
        is one XLA compile, so the bucket count is a compile-time budget,
        not a fidelity knob (start offsets stay fully random).

        Returns stacked arrays ``[n_inst, B, 2, La] / [..., Lb]``.
        """
        n_items = next(iter(batch_a.values())).shape[0]
        la, lb, sa, sb = self.collate_plan(n_items, rng, quantum)
        a = np.stack(
            [
                np.stack([batch_a[i][j, :, sa[j] : sa[j] + la] for j in range(n_items)])
                for i in self.instruments
            ]
        )
        b = np.stack(
            [
                np.stack([batch_b[i][j, :, sb[j] : sb[j] + lb] for j in range(n_items)])
                for i in self.instruments
            ]
        )
        return a, b

    # ------------------------------------------------------------------
    def _val_cache_path(self, idx: int) -> Optional[str]:
        if self.mode != "val" or not self.val_cache_dir:
            return None
        return os.path.join(self.val_cache_dir, str(idx))

    def _load_val_cache(self, idx: int):
        path = self._val_cache_path(idx)
        if path is None or not os.path.isdir(path):
            return None
        out = {}
        for inst in self.instruments:
            out[inst] = []
            for k in range(self.num_strong_negatives + 1):
                a, _ = read_wav(os.path.join(path, f"{inst}_A{k+1}.wav"))
                b, _ = read_wav(os.path.join(path, f"{inst}_B{k+1}.wav"))
                out[inst].append((a.T, b.T))
        return out

    def _save_val_cache(self, idx: int, cache) -> None:
        path = self._val_cache_path(idx)
        if path is None:
            return
        os.makedirs(path, exist_ok=True)
        for inst, pairs in cache.items():
            for k, (a, b) in enumerate(pairs):
                write_wav(os.path.join(path, f"{inst}_A{k+1}.wav"), a.T, self.sample_rate)
                write_wav(os.path.join(path, f"{inst}_B{k+1}.wav"), b.T, self.sample_rate)

    # ------------------------------------------------------------------
    def generate_contents_w_effects(
        self, num_content: int, num_effects: int, out_dir: str, seed: int = 0
    ) -> None:
        """Data-inspection hook: write a grid of FX-manipulated contents +
        mixtures to WAV for listening (reference ``data_loader.py:290-348``)."""
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.default_rng(seed)
        keys = jax.random.split(jax.random.PRNGKey(seed), num_effects)
        mixtures = np.zeros(
            (num_effects, num_content, 2, self.segment_length), np.float32
        )
        for inst in self.instruments:
            segs = self.files.sample_segments(
                rng, inst, num_content, self.segment_length + 2 * self.pad
            )
            for c in range(num_content):
                write_wav(
                    os.path.join(out_dir, f"{inst}_ori_{c}.wav"),
                    segs[c, :, self.pad : self.pad + self.segment_length].T
                    if self.pad
                    else segs[c].T,
                    self.sample_rate,
                )
            for e in range(num_effects):
                man = np.asarray(self.manipulators[inst](keys[e], jnp.asarray(segs)))
                if self.pad:
                    man = man[..., self.pad : -self.pad]
                man = np.clip(man, -1, 1)
                for c in range(num_content):
                    tagc = f"{chr(65 + c // 26)}{chr(65 + c % 26)}{e+1}"
                    write_wav(
                        os.path.join(out_dir, f"{inst}_{tagc}.wav"),
                        man[c].T,
                        self.sample_rate,
                    )
                mixtures[e] += man[:, :, : self.segment_length]
        for e in range(num_effects):
            for c in range(num_content):
                tagc = f"{chr(65 + c // 26)}{chr(65 + c % 26)}{e+1}"
                write_wav(
                    os.path.join(out_dir, f"mixture_{tagc}.wav"),
                    np.clip(mixtures[e, c], -1, 1).T,
                    self.sample_rate,
                )


class StyleTransferTripletDataset:
    """Converter training data: (A1 input, A2 ground truth, B2 reference)."""

    def __init__(
        self,
        data_dir: str,
        mode: str = "train",
        instruments: Sequence[str] = ("drums", "bass", "other", "vocals"),
        segment_length: int = 2**17,
        apply_prob_dict: Optional[Dict[str, float]] = None,
        reverb_prob: Optional[Dict[str, float]] = None,
        ir_bank: Optional[np.ndarray] = None,
        use_normalized: bool = True,
        normalization_order: str = "eqcompimagegain",
        fixed_random_seed: int = 777,
        sample_rate: int = 44100,
        pad_b4_manipulation: bool = True,
    ):
        self.files = _MUSDBFiles(
            os.path.join(data_dir, mode), instruments, use_normalized,
            normalization_order, sample_rate=sample_rate,
        )
        self.mode = mode
        self.instruments = tuple(instruments)
        self.segment_length = segment_length
        self.fixed_random_seed = fixed_random_seed
        self.sample_rate = sample_rate
        self.pad = PAD_B4_MANIPULATION if pad_b4_manipulation else 0
        self.manipulators = make_instrument_manipulators(
            instruments, apply_prob_dict, reverb_prob, ir_bank, sample_rate
        )
        self._jitted = {
            inst: jax.jit(chain) for inst, chain in self.manipulators.items()
        }

    def __len__(self) -> int:
        inst = self.instruments[-1]
        return sum(self.files.lengths[inst]) // self.segment_length

    def _seed_for(self, idx: int, epoch_seed: Optional[int]) -> int:
        if self.mode == "train":
            return (epoch_seed or 0) * 1_000_003 + idx
        return idx * self.fixed_random_seed

    def batch_keys(
        self, indices: Sequence[int], epoch_seed: Optional[int] = None
    ) -> np.ndarray:
        """Per-instrument FX keys ``[n_inst, B, 2] uint32`` as one batched
        dispatch (precomputable for a whole epoch; see
        ``ContrastivePairDataset.batch_keys``)."""
        seeds = [self._seed_for(idx, epoch_seed) for idx in indices]
        keys = host_split_keys(seeds, len(self.instruments))  # [B, n_inst, 2]
        return np.ascontiguousarray(keys.transpose(1, 0, 2))

    def sample_raw_batch(
        self,
        indices: Sequence[int],
        epoch_seed: Optional[int] = None,
        transport: str = "auto",
        keys: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Host side of the fused converter step (``train/fused.py``): raw
        segments + per-instrument FX keys, no device work. ``keys``:
        precomputed :meth:`batch_keys` output for ``indices``. Returns
        ``(segs [n_inst, B, 2, 2, L_load], keys [n_inst, B, 2] uint32)``."""
        load_len = self.segment_length + 2 * self.pad
        n_inst, B = len(self.instruments), len(indices)
        segs = np.zeros((n_inst, B, 2, 2, load_len), np.float32)
        for j, idx in enumerate(indices):
            if self.mode == "train":
                rng = np.random.default_rng(
                    np.random.SeedSequence([epoch_seed or 0, idx])
                )
            else:
                rng = np.random.default_rng(idx * self.fixed_random_seed)
            for ii in range(n_inst):
                segs[ii, j] = self.files.sample_segments(
                    rng, self.instruments[ii], 2, load_len
                )
        if keys is None:
            keys = self.batch_keys(indices, epoch_seed)
        return to_transport(segs, transport), keys

    def sample_batch(
        self, indices: Sequence[int], epoch_seed: Optional[int] = None
    ) -> Dict[str, Dict[str, np.ndarray]]:
        """Returns ``inst -> {'a1','a2','b2'} -> [B, 2, L]``."""
        load_len = self.segment_length + 2 * self.pad
        out: Dict[str, Dict[str, List[np.ndarray]]] = {
            i: {"a1": [], "a2": [], "b2": []} for i in self.instruments
        }
        for idx in indices:
            if self.mode == "train":
                rng = np.random.default_rng(np.random.SeedSequence([epoch_seed or 0, idx]))
                key = jax.random.PRNGKey((epoch_seed or 0) * 1_000_003 + idx)
            else:
                rng = np.random.default_rng(idx * self.fixed_random_seed)
                key = jax.random.PRNGKey(idx * self.fixed_random_seed)
            keys = jax.random.split(key, len(self.instruments))
            for ii, inst in enumerate(self.instruments):
                segs = self.files.sample_segments(rng, inst, 2, load_len)
                man = np.asarray(self._jitted[inst](keys[ii], jnp.asarray(segs)))
                sl = slice(self.pad, self.pad + self.segment_length)
                out[inst]["a1"].append(np.clip(segs[0, :, sl], -1, 1))
                out[inst]["a2"].append(np.clip(man[0, :, sl], -1, 1))
                out[inst]["b2"].append(np.clip(man[1, :, sl], -1, 1))
        return {
            i: {k: np.stack(v) for k, v in d.items()} for i, d in out.items()
        }
