"""Boot the HTTP server and exercise its routes (counterpart of the
reference's tests/bash_tests/test_demo_server.sh)."""

import argparse
import io
import json
import threading
import urllib.request

import pytest
import scipy.io.wavfile


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    from tests.test_api import _make_glow_checkpoint
    from tpu_tts.server.server import create_server

    tmp = tmp_path_factory.mktemp("srv")
    ckpt, cfg_path = _make_glow_checkpoint(tmp)
    args = argparse.Namespace(
        model_name=None,
        model_path=ckpt,
        config_path=cfg_path,
        vocoder_path=None,
        vocoder_config_path=None,
        vocoder_name=None,
        speakers_file_path=None,
        host="127.0.0.1",
        port=0,  # pick a free port
    )
    srv = create_server(args)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=120) as r:
        return r.status, r.headers.get("Content-Type", ""), r.read()


def test_api_tts_route(server):
    status, ctype, body = _get(server + "/api/tts?text=hello%20server")
    assert status == 200 and ctype == "audio/wav"
    sr, wav = scipy.io.wavfile.read(io.BytesIO(body))
    assert sr == 22050 and len(wav) > 1000


def test_details_and_index(server):
    status, ctype, body = _get(server + "/details")
    assert status == 200
    details = json.loads(body)
    assert details["tts_config"]["model"] == "glow_tts"
    status, ctype, _ = _get(server + "/")
    assert status == 200 and "html" in ctype


def test_marytts_routes(server):
    status, _, body = _get(server + "/locales")
    assert status == 200 and b"en_US" in body
    status, _, body = _get(server + "/voices")
    assert status == 200 and body.strip()
    status, ctype, body = _get(server + "/process?INPUT_TEXT=mary%20says%20hi")
    assert status == 200 and ctype == "audio/wav"


def test_missing_text_is_400(server):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server + "/api/tts")
    assert ei.value.code == 400
