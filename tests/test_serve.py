"""Serving-layer test: warm engine behind the HTTP API."""
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from music_mixing_style_transfer_tpu.config import FXencoderConfig, InferenceConfig, TCNConfig
from music_mixing_style_transfer_tpu.data import write_wav
from music_mixing_style_transfer_tpu.infer.pipeline import StyleTransferEngine
from music_mixing_style_transfer_tpu.serve import StyleTransferService, serve

SR = 44100
SMALL_ENC = FXencoderConfig(channels=(8, 16), kernels=(25, 15), strides=(4, 4), dilation=(1, 1))
SMALL_TCN = TCNConfig(condition_dimension=16, nblocks=2, channel_width=8, kernel_size=7)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    engine = StyleTransferEngine(encoder_cfg=SMALL_ENC, converter_cfg=SMALL_TCN)
    cfg = InferenceConfig(
        segment_length=8192, segment_length_ref=8192,
        normalize_input=False, do_not_separate=True,
    )
    service = StyleTransferService(engine, cfg)
    httpd = serve(service, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), headers={"Content-Type": "application/json"}
    )
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_health(server):
    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        data = json.loads(r.read())
    assert data["status"] == "ok"


def test_transfer_endpoint(server, tmp_path, rng):
    target = tmp_path / "songs"
    for name in ["input", "reference"]:
        for inst in ("drums", "bass", "other", "vocals"):
            x = (rng.standard_normal((12_000, 2)) * 0.2).astype(np.float32)
            write_wav(str(target / "s1" / "separated" / name / f"{inst}.wav"), x, SR)
    out = _post(
        server + "/transfer",
        {"target_dir": str(target) + "/", "output_dir": str(tmp_path / "out") + "/"},
    )
    assert len(out["written"]) == 1
    from music_mixing_style_transfer_tpu.data import read_wav

    mix, _ = read_wav(out["written"][0])
    assert mix.shape[0] == 12_000


def test_embed_endpoint(server, tmp_path, rng):
    wav = str(tmp_path / "e.wav")
    write_wav(wav, (rng.standard_normal((20_000, 2)) * 0.2).astype(np.float32), SR)
    out = _post(server + "/embed", {"wav": wav, "segment_length": 8192})
    emb = np.asarray(out["embedding"])
    assert emb.shape == (SMALL_ENC.channels[-1],)
    assert np.isfinite(emb).all()


def test_mesh_serving_sequence_parallel(tmp_path, rng):
    """Multi-chip serving path (serve.py --data_parallel N
    --sequence_parallel): mesh engine + time-sharded conversion behind the
    same HTTP API, on the virtual CPU mesh."""
    from music_mixing_style_transfer_tpu.parallel import create_mesh

    engine = StyleTransferEngine(
        encoder_cfg=SMALL_ENC, converter_cfg=SMALL_TCN, mesh=create_mesh(4)
    )
    cfg = InferenceConfig(
        segment_length=8192, segment_length_ref=8192,
        normalize_input=False, do_not_separate=True, sequence_parallel=True,
    )
    httpd = serve(StyleTransferService(engine, cfg), port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        target = tmp_path / "songs"
        for name in ["input", "reference"]:
            for inst in ("drums", "bass", "other", "vocals"):
                x = (rng.standard_normal((12_000, 2)) * 0.2).astype(np.float32)
                write_wav(str(target / "s1" / "separated" / name / f"{inst}.wav"), x, SR)
        out = _post(
            url + "/transfer",
            {"target_dir": str(target) + "/", "output_dir": str(tmp_path / "out") + "/"},
        )
        assert len(out["written"]) == 1
        from music_mixing_style_transfer_tpu.data import read_wav

        mix, _ = read_wav(out["written"][0])
        assert mix.shape[0] == 12_000 and np.isfinite(mix).all()
    finally:
        httpd.shutdown()


def test_warmup_endpoint(server):
    """POST /warmup compiles + executes the request path on a synthetic song
    and returns cold/warm timings (serve.py --warmup_seconds analogue); the
    warm pass must reuse the cold pass's executables."""
    out = _post(server + "/warmup", {"seconds": 0.5})
    assert out["seconds"] == 0.5
    assert out["cold_s"] > 0 and out["warm_s"] > 0
    # the cold pass pays the compiles; warm must not recompile
    assert out["warm_s"] <= out["cold_s"]


def test_admission_queue_unit():
    """Bounded admission semantics without HTTP: FIFO behind one chip slot,
    reject past max_queue, warmup only when idle."""
    from music_mixing_style_transfer_tpu.serve import (
        AdmissionQueue,
        QueueFullError,
        ServiceBusyError,
    )

    q = AdmissionQueue(max_queue=1)
    q.acquire()  # running
    assert q.snapshot() == {"busy": True, "queue_depth": 0, "max_queue": 1}
    with pytest.raises(ServiceBusyError):
        q.acquire_if_idle()

    waiter_in = threading.Event()
    def waiter():
        q.acquire()
        waiter_in.set()
        q.release()

    t = threading.Thread(target=waiter, daemon=True)
    t.start()
    for _ in range(100):  # waiter has joined the queue (depth 1)
        if q.snapshot()["queue_depth"] == 1:
            break
        import time; time.sleep(0.01)
    assert q.snapshot()["queue_depth"] == 1
    with pytest.raises(QueueFullError):
        q.acquire()  # 1 running + 1 waiting == capacity
    q.release()
    assert waiter_in.wait(timeout=5)
    t.join(timeout=5)
    assert q.snapshot() == {"busy": False, "queue_depth": 0, "max_queue": 1}
    q.acquire_if_idle()  # idle again: warmup admissible
    q.release()


def test_admission_queue_fifo_ordering():
    """Three queued waiters must be admitted in arrival order — the queue's
    documented FIFO is a ticket+Condition guarantee, not CPython lock-wakeup
    luck (serve.py:AdmissionQueue)."""
    import time

    from music_mixing_style_transfer_tpu.serve import AdmissionQueue

    q = AdmissionQueue(max_queue=3)
    q.acquire()  # hold the chip slot so waiters stack up
    order = []
    started = []

    def waiter(i):
        started.append(i)
        q.acquire()  # ticket taken under the condition lock, in start order
        order.append(i)
        q.release()

    threads = []
    for i in range(3):
        t = threading.Thread(target=waiter, args=(i,), daemon=True)
        t.start()
        # ensure waiter i has its ticket before starting waiter i+1
        for _ in range(500):
            if q.snapshot()["queue_depth"] == i + 1:
                break
            time.sleep(0.005)
        assert q.snapshot()["queue_depth"] == i + 1
        threads.append(t)

    q.release()  # serve the queue
    for t in threads:
        t.join(timeout=10)
    assert order == [0, 1, 2]
    assert q.snapshot() == {"busy": False, "queue_depth": 0, "max_queue": 3}


def test_concurrent_transfers_and_health(server, tmp_path, rng):
    """Two concurrent /transfer requests both succeed (one queues behind the
    other) and /health reports the admission fields."""
    target = tmp_path / "songs_cc"
    for name in ["input", "reference"]:
        for inst in ("drums", "bass", "other", "vocals"):
            x = (rng.standard_normal((12_000, 2)) * 0.2).astype(np.float32)
            write_wav(str(target / "s1" / "separated" / name / f"{inst}.wav"), x, SR)
    results, errors = [], []

    def run(i):
        try:
            results.append(
                _post(
                    server + "/transfer",
                    {
                        "target_dir": str(target) + "/",
                        "output_dir": str(tmp_path / f"out_cc{i}") + "/",
                    },
                )
            )
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors and len(results) == 2
    assert all(len(r["written"]) == 1 for r in results)

    with urllib.request.urlopen(server + "/health", timeout=60) as r:
        h = json.loads(r.read())
    assert h["busy"] is False and h["queue_depth"] == 0 and h["max_queue"] == 4


def test_queue_full_and_warmup_busy(tmp_path, rng):
    """With the chip slot held, /embed overflows a max_queue=0 service with
    429 (+Retry-After) and /warmup declines with 409."""
    engine = StyleTransferEngine(encoder_cfg=SMALL_ENC, converter_cfg=SMALL_TCN)
    cfg = InferenceConfig(
        segment_length=8192, segment_length_ref=8192,
        normalize_input=False, do_not_separate=True,
    )
    service = StyleTransferService(engine, cfg, max_queue=0)
    httpd = serve(service, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    wav = str(tmp_path / "q.wav")
    write_wav(wav, (rng.standard_normal((20_000, 2)) * 0.2).astype(np.float32), SR)
    try:
        service.admission.acquire()  # simulate an in-flight request
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(url + "/embed", {"wav": wav, "segment_length": 8192})
            assert ei.value.code == 429
            assert ei.value.headers.get("Retry-After") == "30"
            assert json.loads(ei.value.read())["queue_depth"] == 0
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(url + "/warmup", {"seconds": 0.25})
            assert ei.value.code == 409
        finally:
            service.admission.release()
        # admitted again once the slot frees
        out = _post(url + "/embed", {"wav": wav, "segment_length": 8192})
        assert np.isfinite(np.asarray(out["embedding"])).all()
    finally:
        httpd.shutdown()
