"""Zenodo downloader (data/zenodo.py) driven against a localhost HTTP server.

The reference's downloader (Diffusion_model/utils/zenodo.py:32-92) is
exercised only against the live Zenodo record; here the chunked streaming
download, UA-rotation retry, atomic .part rename, skip-if-exists, and
idempotent unzip are all unit-tested with no network egress.
"""
import io
import os
import threading
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from diffusion_model_project_tpu.data import zenodo


PAYLOAD = os.urandom(3 * (1 << 20) + 12345)  # >3 chunks at the 1 MiB default


class _Handler(BaseHTTPRequestHandler):
    """Serves PAYLOAD at /files/blob.zip; optionally 403s the first N UAs."""

    reject_first_n_uas = 0
    seen_uas = []

    def do_GET(self):
        ua = self.headers.get("User-Agent", "")
        type(self).seen_uas.append(ua)
        if len(type(self).seen_uas) <= type(self).reject_first_n_uas:
            self.send_response(403)
            self.end_headers()
            return
        body = PAYLOAD
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr noise
        pass


@pytest.fixture()
def http_server():
    _Handler.reject_first_n_uas = 0
    _Handler.seen_uas = []
    server = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    thread.join()


def test_is_url():
    assert zenodo.is_url("https://zenodo.org/records/18341260/files/x.zip")
    assert zenodo.is_url("http://127.0.0.1:8000/f.zip?download=1")
    assert not zenodo.is_url("/local/path/f.zip")
    assert not zenodo.is_url("dataset")
    assert not zenodo.is_url("ftp://host/f.zip")  # scheme not in (http, https)


def test_download_data_streams_and_renames(http_server, tmp_path):
    url = f"{http_server}/files/blob.zip?download=1"
    out = zenodo.download_data(url, str(tmp_path))
    assert os.path.basename(out) == "blob.zip"  # query string stripped
    with open(out, "rb") as f:
        assert f.read() == PAYLOAD
    assert not os.path.exists(out + ".part")  # atomic rename cleaned up


def test_download_data_skips_existing(http_server, tmp_path):
    existing = tmp_path / "blob.zip"
    existing.write_bytes(b"already here")
    out = zenodo.download_data(f"{http_server}/files/blob.zip", str(tmp_path))
    assert out == str(existing)
    assert existing.read_bytes() == b"already here"  # never re-fetched
    assert _Handler.seen_uas == []  # no request went out


def test_download_data_rotates_user_agents(http_server, tmp_path):
    _Handler.reject_first_n_uas = 2  # first two UAs get 403
    out = zenodo.download_data(f"{http_server}/files/blob.zip", str(tmp_path))
    with open(out, "rb") as f:
        assert f.read() == PAYLOAD
    assert len(_Handler.seen_uas) == 3
    assert len(set(_Handler.seen_uas)) == 3  # three DISTINCT browser UAs


def test_download_data_raises_after_all_uas_fail(http_server, tmp_path):
    _Handler.reject_first_n_uas = 99
    with pytest.raises(RuntimeError, match="Failed to download"):
        zenodo.download_data(f"{http_server}/files/blob.zip", str(tmp_path))
    assert len(_Handler.seen_uas) == len(zenodo._USER_AGENTS)


def _make_zip(path, folder_name):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(f"{folder_name}/a.txt", "alpha")
        zf.writestr(f"{folder_name}/sub/b.txt", "beta")
    path.write_bytes(buf.getvalue())


def test_unzip_data_idempotent(tmp_path):
    zip_path = tmp_path / "dataset_3d.zip"
    _make_zip(zip_path, "dataset_3d")
    folder = zenodo.unzip_data(str(zip_path), str(tmp_path))
    assert folder == str(tmp_path / "dataset_3d")
    assert (tmp_path / "dataset_3d" / "a.txt").read_text() == "alpha"
    assert (tmp_path / "dataset_3d" / "sub" / "b.txt").read_text() == "beta"

    # second call must not re-extract (marker file survives)
    marker = tmp_path / "dataset_3d" / "marker"
    marker.write_text("keep")
    (tmp_path / "dataset_3d" / "a.txt").unlink()
    assert zenodo.unzip_data(str(zip_path), str(tmp_path)) == folder
    assert marker.read_text() == "keep"
    assert not (tmp_path / "dataset_3d" / "a.txt").exists()


def test_download_dataset_composes(http_server, tmp_path, monkeypatch):
    """download_dataset = download_data(DATASET_URL) + unzip_data, end-to-end
    against the local server with a real zip payload."""
    folder_name = "dataset_3d"
    zip_bytes = io.BytesIO()
    with zipfile.ZipFile(zip_bytes, "w") as zf:
        zf.writestr(f"{folder_name}/x/0.pt", b"\x00" * 16)
    global PAYLOAD
    old_payload = PAYLOAD
    try:
        PAYLOAD = zip_bytes.getvalue()
        monkeypatch.setattr(
            zenodo, "DATASET_URL",
            f"{http_server}/files/{folder_name}.zip?download=1")
        folder = zenodo.download_dataset(str(tmp_path))
        assert folder == str(tmp_path / folder_name)
        assert (tmp_path / folder_name / "x" / "0.pt").exists()
    finally:
        PAYLOAD = old_payload
