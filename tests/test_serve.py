"""Serving-layer test: warm engine behind the HTTP API."""
import json
import threading
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
