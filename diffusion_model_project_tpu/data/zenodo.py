"""Zenodo dataset / pretrained-model download utilities.

Same record and file URLs as the reference (Diffusion_model/utils/zenodo.py:13-19):
Zenodo record 18341260 hosting dataset_3d.zip (~2.1 GB), VAE's.zip (~1.7 GB)
and the published diffusion checkpoint (~2.2 GB). Chunked streaming download
with progress and idempotent unzip (zenodo.py:32-92).
"""
from __future__ import annotations

import os
import os.path as osp
import zipfile
from urllib.parse import urlparse

ZENODO_RECORD = "18341260"
_BASE = f"https://zenodo.org/records/{ZENODO_RECORD}/files"

DATASET_URL = f"{_BASE}/dataset_3d.zip?download=1"
VAE_MODELS_URL = f"{_BASE}/VAE's.zip?download=1"
DIFFUSION_MODEL_URL = (
    f"{_BASE}/20260120_unet_latent-diffusion_in-17-out-8-f-5-k-3-p-zeros-"
    f"a-3..2-dr-0.0-wd-0.00e+00-b-2-lr-1.00e-03-ep-104.zip?download=1"
)

_USER_AGENTS = [
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/119.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Safari/605.1.15",
]


def is_url(path_or_url: str) -> bool:
    try:
        result = urlparse(path_or_url)
        return all([result.scheme in ("http", "https"), result.netloc])
    except (ValueError, AttributeError):
        return False


def download_data(url: str, save_dir: str, chunk_size: int = 1 << 20) -> str:
    """Stream-download ``url`` into ``save_dir``; skips if the file exists."""
    import requests

    os.makedirs(save_dir, exist_ok=True)
    filename = osp.basename(urlparse(url).path)
    out_path = osp.join(save_dir, filename)
    if osp.exists(out_path):
        print(f'File "{out_path}" already exists; skipping download.')
        return out_path

    last_err = None
    for ua in _USER_AGENTS:
        try:
            with requests.get(url, stream=True, timeout=60,
                              headers={"User-Agent": ua}) as r:
                r.raise_for_status()
                total = int(r.headers.get("content-length", 0))
                done = 0
                tmp_path = out_path + ".part"
                with open(tmp_path, "wb") as f:
                    for chunk in r.iter_content(chunk_size=chunk_size):
                        f.write(chunk)
                        done += len(chunk)
                        if total:
                            print(f"\rDownloading {filename}: {done / total:6.1%}", end="")
                print()
                os.replace(tmp_path, out_path)
                return out_path
        except Exception as e:  # retry with next UA
            last_err = e
    raise RuntimeError(f"Failed to download {url}: {last_err}")


def unzip_data(zip_path: str, save_dir: str) -> str:
    """Idempotent unzip; returns the extracted folder path."""
    folder_name = osp.splitext(osp.basename(zip_path))[0]
    folder_path = osp.join(save_dir, folder_name)
    if osp.exists(folder_path) and os.listdir(folder_path):
        print(f'Folder "{folder_path}" already exists; skipping unzip.')
        return folder_path
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(save_dir)
    return folder_path


def download_dataset(save_dir: str = "dataset") -> str:
    zip_path = download_data(DATASET_URL, save_dir)
    return unzip_data(zip_path, save_dir)


def download_vae_models(save_dir: str = "pretrained") -> str:
    zip_path = download_data(VAE_MODELS_URL, save_dir)
    return unzip_data(zip_path, save_dir)


def download_diffusion_model(save_dir: str = "pretrained") -> str:
    zip_path = download_data(DIFFUSION_MODEL_URL, save_dir)
    return unzip_data(zip_path, save_dir)
