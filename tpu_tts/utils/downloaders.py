"""Public-dataset download helpers used by the recipes.

Same surface as /root/reference/TTS/utils/downloaders.py (download_ljspeech:7,
download_vctk:22, download_tweb:42, download_libri_tts:51,
download_thorsten_de:90, download_mailabs:105), rebuilt on stdlib
urllib/tarfile/zipfile instead of the reference's torchaudio-derived
download.py stack. Kaggle-backed datasets need the `kaggle` CLI installed and
configured, exactly as in the reference.
"""

import os
import sys
import tarfile
import urllib.request
import zipfile
from typing import List, Optional

_DATASET_URLS = {
    "ljspeech": "https://data.keithito.com/data/speech/LJSpeech-1.1.tar.bz2",
    "vctk": "https://datashare.ed.ac.uk/bitstream/handle/10283/3443/VCTK-Corpus-0.92.zip",
    "thorsten-de": "https://www.openslr.org/resources/95/thorsten-de_v02.tgz",
}

_LIBRI_TTS_SUBSETS = {
    "libri-tts-clean-100": "http://www.openslr.org/resources/60/train-clean-100.tar.gz",
    "libri-tts-clean-360": "http://www.openslr.org/resources/60/train-clean-360.tar.gz",
    "libri-tts-other-500": "http://www.openslr.org/resources/60/train-other-500.tar.gz",
    "libri-tts-dev-clean": "http://www.openslr.org/resources/60/dev-clean.tar.gz",
    "libri-tts-dev-other": "http://www.openslr.org/resources/60/dev-other.tar.gz",
    "libri-tts-test-clean": "http://www.openslr.org/resources/60/test-clean.tar.gz",
    "libri-tts-test-other": "http://www.openslr.org/resources/60/test-other.tar.gz",
}

_MAILABS_URLS = {
    "english": "https://data.solak.de/data/Training/stt_tts/en_US.tgz",
    "german": "https://data.solak.de/data/Training/stt_tts/de_DE.tgz",
    "french": "https://data.solak.de/data/Training/stt_tts/fr_FR.tgz",
    "italian": "https://data.solak.de/data/Training/stt_tts/it_IT.tgz",
    "spanish": "https://data.solak.de/data/Training/stt_tts/es_ES.tgz",
}


def download_url(url: str, download_folder: str, filename: Optional[str] = None) -> str:
    """Stream `url` into `<download_folder>/<filename>` with a progress line."""
    os.makedirs(download_folder, exist_ok=True)
    filename = filename or os.path.basename(url)
    target = os.path.join(download_folder, filename)

    def _progress(n_blocks, block_size, total):
        if total > 0 and sys.stderr.isatty():
            done = min(n_blocks * block_size / total, 1.0)
            sys.stderr.write(f"\r > Downloading {filename}: {done * 100:5.1f}%")
            if done >= 1.0:
                sys.stderr.write("\n")

    print(f" > Downloading {url} ...")
    urllib.request.urlretrieve(url, target, reporthook=_progress)
    return target


def extract_archive(from_path: str, to_path: Optional[str] = None) -> List[str]:
    """Extract a .zip/.tar[.gz|.bz2]/.tgz archive next to itself (or to_path)."""
    to_path = to_path or os.path.dirname(from_path)
    if from_path.endswith(".zip"):
        with zipfile.ZipFile(from_path) as zf:
            zf.extractall(to_path)
            return [os.path.join(to_path, n) for n in zf.namelist()]
    with tarfile.open(from_path) as tf:
        tf.extractall(to_path)
        return [os.path.join(to_path, m.name) for m in tf.getmembers()]


def download_kaggle_dataset(dataset_path: str, dataset_name: str, output_path: str):
    """Fetch a Kaggle dataset via the `kaggle` CLI (ref download.py:177)."""
    data_path = os.path.join(output_path, dataset_name)
    try:
        import kaggle  # noqa: F401 — needs ~/.kaggle/kaggle.json

        kaggle.api.dataset_download_files(dataset_path, path=data_path, unzip=True)
    except (ImportError, OSError) as e:
        raise RuntimeError(
            "Kaggle download needs the `kaggle` package and an API token "
            "(~/.kaggle/kaggle.json) — see https://github.com/Kaggle/kaggle-api"
        ) from e


def _download_and_extract(url: str, path: str):
    os.makedirs(path, exist_ok=True)
    archive = download_url(url, path)
    print(" > Extracting archive file...")
    extract_archive(archive)


def download_ljspeech(path: str):
    """Download and extract the LJSpeech dataset (ref downloaders.py:7)."""
    _download_and_extract(_DATASET_URLS["ljspeech"], path)


def download_vctk(path: str, use_kaggle: Optional[bool] = False):
    """Download and extract the VCTK dataset (ref downloaders.py:22)."""
    if use_kaggle:
        download_kaggle_dataset("mfekadu/english-multispeaker-corpus-for-voice-cloning", "VCTK", path)
    else:
        _download_and_extract(_DATASET_URLS["vctk"], path)


def download_tweb(path: str):
    """Download and extract the TWEB dataset via Kaggle (ref downloaders.py:42)."""
    download_kaggle_dataset("bryanpark/the-world-english-bible-speech-dataset", "TWEB", path)


def download_libri_tts(path: str, subset: Optional[str] = "all"):
    """Download and extract LibriTTS subsets (ref downloaders.py:51)."""
    os.makedirs(path, exist_ok=True)
    subsets = _LIBRI_TTS_SUBSETS if subset == "all" else {subset: _LIBRI_TTS_SUBSETS[subset]}
    for name, url in subsets.items():
        print(f" > Downloading {name}...")
        _download_and_extract(url, path)
    if subset == "all":
        print(" > All subsets downloaded")


def download_thorsten_de(path: str):
    """Download and extract the Thorsten german voice dataset (ref :90)."""
    _download_and_extract(_DATASET_URLS["thorsten-de"], path)


def download_mailabs(path: str, language: str = "english"):
    """Download and extract an M-AILABS language subset (ref :105)."""
    _download_and_extract(_MAILABS_URLS[language], path)
