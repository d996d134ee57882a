"""HTTP serving for mixing style transfer.

A lightweight stdlib HTTP server wrapping a warm :class:`StyleTransferEngine`
(the reference ships no serving layer; this framework targets production
deployment, so keeping models + compiled executables resident across
requests matters — cold per-song CLI invocations pay ~30s of executable
cache loading, a warm server pays it once).

Endpoints (JSON over POST unless noted):

- ``GET  /health``      -> {"status": "ok", "backend": ..., "requests": N,
                           "busy": bool, "queue_depth": N, "max_queue": N}
- ``POST /transfer``    -> body {"target_dir": ..., "output_dir": ...,
                           optional "interpolation": bool}
                           runs the directory pipeline, returns written paths
- ``POST /embed``       -> body {"wav": path, "segment_length": int?}
                           returns the 2048-D FX embedding
- ``POST /warmup``      -> body {"seconds": float?} compiles + executes the
                           request path on a synthetic song of that length;
                           returns {"cold_s": ..., "warm_s": ...}
                           (also runs at startup with --warmup_seconds N)

Admission: one request computes at a time (single chip); up to --max_queue
more wait FIFO; beyond that /transfer//embed get 429 + Retry-After. /warmup
only runs when the service is idle (409 otherwise) so it can never block
live traffic.

Run:  python -m music_mixing_style_transfer_tpu.serve --port 8700 \
          [--ckpt_path_enc ... --ckpt_path_conv ... --dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from .config import InferenceConfig, NormalizationConfig
from .data.wavio import read_wav_stereo_ct, read_wav_stereo_ct_i16
from .infer.pipeline import MixingStyleTransfer, StyleTransferEngine
from .utils.logging import get_logger

log = get_logger("serve")


class QueueFullError(Exception):
    """Admission queue at capacity — surface as HTTP 429."""


class ServiceBusyError(Exception):
    """Admission-aware endpoint declined to queue — surface as HTTP 409."""


class AdmissionQueue:
    """Bounded FIFO admission to the chip (one request computes at a time;
    the chip serializes anyway — this makes the queue VISIBLE and BOUNDED
    instead of an invisible pile-up behind a lock).

    ``acquire()`` joins the queue or raises :class:`QueueFullError` when
    ``max_queue`` requests are already waiting; ``acquire_if_idle()`` only
    proceeds when nothing is queued or running (warmup must never block a
    live request). ``snapshot()`` feeds ``/health``.

    FIFO is guaranteed by admission tickets: each ``acquire`` takes the
    next ticket number and waits on a :class:`threading.Condition` until
    the serving counter reaches it (a bare ``Lock`` queue has NO wakeup
    order guarantee in CPython — under contention admission would be
    arbitrary, with starvation possible; tests/test_serve.py pins the
    ordering with three queued requests).
    """

    def __init__(self, max_queue: int = 4):
        self.max_queue = int(max_queue)
        self._cond = threading.Condition()
        self._admitted = 0      # running (<=1) + waiting
        self._next_ticket = 0   # next ticket to hand out
        self._serving = 0       # ticket currently allowed on the chip

    def acquire(self) -> None:
        with self._cond:
            if self._admitted > self.max_queue:  # 1 running + max_queue waiting
                raise QueueFullError(
                    f"queue full ({self.max_queue} waiting); retry later"
                )
            self._admitted += 1
            ticket = self._next_ticket
            self._next_ticket += 1
            while ticket != self._serving:
                self._cond.wait()

    def acquire_if_idle(self) -> None:
        with self._cond:
            if self._admitted > 0:
                raise ServiceBusyError("requests in flight; warmup declined")
            self._admitted += 1
            self._next_ticket += 1  # idle: our ticket == _serving already

    def release(self) -> None:
        with self._cond:
            self._serving += 1
            self._admitted -= 1
            self._cond.notify_all()

    def snapshot(self) -> dict:
        with self._cond:
            return {
                "busy": self._admitted > 0,
                "queue_depth": max(self._admitted - 1, 0),
                "max_queue": self.max_queue,
            }


class StyleTransferService:
    """Warm engine + (optional) normalizer; bounded-queue admission to the chip."""

    def __init__(
        self,
        engine: StyleTransferEngine,
        inference_cfg: Optional[InferenceConfig] = None,
        normalizer=None,
        max_queue: int = 4,
    ):
        self.engine = engine
        self.cfg = inference_cfg or InferenceConfig()
        self.normalizer = normalizer
        self.admission = AdmissionQueue(max_queue)
        self.requests = 0

    def transfer(self, target_dir: str, output_dir: Optional[str] = None, interpolation: bool = False):
        import dataclasses

        self.admission.acquire()
        try:
            self.requests += 1
            cfg = dataclasses.replace(self.cfg, interpolation=interpolation)
            pipeline = MixingStyleTransfer(self.engine, cfg, normalizer=self.normalizer)
            return pipeline.run_directory(target_dir, output_dir)
        finally:
            self.admission.release()

    def warmup(self, seconds: float = 30.0):
        """Compile + execute the production request shapes before traffic.

        A cold process pays one-time costs on its first real request
        (executable compiles / compile-cache loads; ~90 s to first byte on
        the TPU tunnel, BENCH_r02 song0 tail) — a deploy should eat that at
        startup, not on a user. Runs a synthetic song of ``seconds`` through
        the exact request path (PCM stem stacks -> transfer_song_pcm, plus
        embed) twice and returns cold/warm wall times. Song lengths bucket
        to whole segments (pipeline ``Tb``), so one warmup covers every song
        that rounds to the same segment count; a second ``seconds`` value
        can be warmed via ``POST /warmup``.
        """
        import time

        self.admission.acquire_if_idle()
        try:
            cfg = self.cfg
            pipeline = MixingStyleTransfer(self.engine, cfg, normalizer=self.normalizer)
            rng = np.random.default_rng(0)
            S = len(cfg.instruments)
            T = int(seconds * cfg.sample_rate)
            pcm = lambda: (rng.standard_normal((S, 2, T)) * 4000).astype(np.int16)
            out = {"seconds": seconds}
            for key in ("cold_s", "warm_s"):
                t0 = time.perf_counter()
                mix, _ = pipeline.transfer_song_pcm(pcm(), pcm())
                self.engine.embed_song(
                    pcm()[0].astype(np.float32) / 32768.0, cfg.segment_length_ref
                )
                assert np.isfinite(mix.astype(np.float32)).all()
                out[key] = round(time.perf_counter() - t0, 3)
            log.info(
                "warmup(%.1fs song): cold %.2fs, warm %.2fs",
                seconds, out["cold_s"], out["warm_s"],
            )
            return out
        finally:
            self.admission.release()

    def embed(self, wav_path: str, segment_length: Optional[int] = None):
        self.admission.acquire()
        try:
            self.requests += 1
            try:
                # 16-bit PCM uploads int16 and dequantizes on device:
                # half the tunnel traffic, bit-identical embeddings
                audio = read_wav_stereo_ct_i16(
                    wav_path, expected_rate=self.cfg.sample_rate
                )
            except ValueError:
                audio = read_wav_stereo_ct(
                    wav_path, expected_rate=self.cfg.sample_rate
                )
            emb = self.engine.embed_song(
                audio, segment_length or self.cfg.segment_length_ref
            )
            return np.asarray(emb).tolist()
        finally:
            self.admission.release()


def make_handler(service: StyleTransferService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            log.info("%s %s", self.address_string(), fmt % args)

        def do_GET(self):
            if self.path == "/health":
                import jax

                self._send(
                    200,
                    {
                        "status": "ok",
                        "backend": jax.default_backend(),
                        "requests": service.requests,
                        **service.admission.snapshot(),
                    },
                )
            else:
                self._send(404, {"error": "unknown endpoint"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/transfer":
                    written = service.transfer(
                        req["target_dir"],
                        req.get("output_dir"),
                        bool(req.get("interpolation", False)),
                    )
                    self._send(200, {"written": written})
                elif self.path == "/embed":
                    emb = service.embed(req["wav"], req.get("segment_length"))
                    self._send(200, {"embedding": emb})
                elif self.path == "/warmup":
                    self._send(200, service.warmup(float(req.get("seconds", 30.0))))
                else:
                    self._send(404, {"error": "unknown endpoint"})
            except QueueFullError as e:
                self.send_response(429)
                body = json.dumps(
                    {"error": str(e), **service.admission.snapshot()}
                ).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Retry-After", "30")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except ServiceBusyError as e:
                self._send(409, {"error": str(e), **service.admission.snapshot()})
            except Exception as e:  # pragma: no cover - error path
                log.exception("request failed")
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(service: StyleTransferService, port: int = 8700, host: str = "127.0.0.1"):
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    log.info("serving on http://%s:%d", host, port)
    return httpd


def main(argv=None) -> int:
    import jax

    from music_mixing_style_transfer_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--port", type=int, default=8700)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--ckpt_path_enc", type=str, default=None)
    p.add_argument("--ckpt_path_conv", type=str, default=None)
    p.add_argument("--precomputed_normalization_feature", type=str, default=None)
    p.add_argument("--normalize_input", action="store_true")
    p.add_argument("--dtype", type=str, default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--segment_halo", type=int, default=0)
    p.add_argument(
        "--data_parallel", type=int, default=1,
        help="shard the segment batch over an N-chip 'data' mesh "
        "(parameters replicated); 1 = single chip",
    )
    p.add_argument(
        "--sequence_parallel", action="store_true",
        help="with --data_parallel > 1: convert each whole stem in one "
        "time-sharded forward (ppermute conv halos) — boundary-free output",
    )
    p.add_argument(
        "--max_queue", type=int, default=4,
        help="requests allowed to WAIT behind the one computing; beyond "
        "this /transfer and /embed return 429 with Retry-After",
    )
    p.add_argument(
        "--warmup_seconds", type=float, default=0.0,
        help="compile + execute the request path on a synthetic song of "
        "this length before accepting traffic (0 = off); also available "
        "at runtime via POST /warmup {\"seconds\": N}",
    )
    args = p.parse_args(argv)

    # sequence parallelism only exists on a multi-chip mesh through the PCM
    # fast path — fail loudly instead of silently serving segmented output
    if args.sequence_parallel and args.data_parallel <= 1:
        p.error("--sequence_parallel requires --data_parallel > 1")
    if args.sequence_parallel and args.segment_halo > 0:
        p.error(
            "--sequence_parallel is boundary-free already and only runs on "
            "the PCM fast path, which --segment_halo > 0 disables"
        )

    mesh = None
    if args.data_parallel > 1:
        from .parallel import create_mesh

        mesh = create_mesh(args.data_parallel)
    engine = StyleTransferEngine(
        ckpt_path_enc=args.ckpt_path_enc,
        ckpt_path_conv=args.ckpt_path_conv,
        dtype=args.dtype,
        mesh=mesh,
    )
    normalizer = None
    if args.normalize_input and args.precomputed_normalization_feature:
        from .normalize import AudioEffectsNormalizer

        normalizer = AudioEffectsNormalizer(args.precomputed_normalization_feature)
    cfg = InferenceConfig(
        do_not_separate=True,
        normalize_input=normalizer is not None,
        dtype=args.dtype,
        segment_halo=args.segment_halo,
        sequence_parallel=args.sequence_parallel,
    )
    service = StyleTransferService(engine, cfg, normalizer, max_queue=args.max_queue)
    if args.warmup_seconds > 0:
        log.info("warming up (%.1fs synthetic song) before accepting traffic", args.warmup_seconds)
        service.warmup(args.warmup_seconds)
    serve(service, args.port, args.host).serve_forever()
    return 0


if __name__ == "__main__":
    sys.exit(main())
