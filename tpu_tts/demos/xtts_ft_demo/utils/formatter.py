"""Dataset prep for XTTS fine-tuning (mirror of /root/reference/TTS/demos/
xtts_ft_demo/utils/formatter.py): walk audio files, transcribe with
faster-whisper (optional dependency; gated), and write the two-column
metadata CSVs the `coqui` formatter consumes."""

import csv
import os
from typing import List, Optional

AUDIO_TYPES = (".wav", ".mp3", ".flac")


def list_files(base_path: str, valid_exts=None, contains: Optional[str] = None):
    for root_dir, _, filenames in os.walk(base_path):
        for filename in filenames:
            if contains is not None and contains not in filename:
                continue
            ext = filename[filename.rfind(".") :].lower()
            if valid_exts is None or ext.endswith(valid_exts):
                yield os.path.join(root_dir, filename)


def list_audios(base_path: str, contains: Optional[str] = None) -> List[str]:
    return list(list_files(base_path, valid_exts=AUDIO_TYPES, contains=contains))


def write_metadata(rows, out_path: str, eval_percentage: float = 0.15):
    """rows: [(audio_file, text, speaker)] → metadata_train/eval.csv
    (pipe-separated, `coqui` formatter schema)."""
    os.makedirs(out_path, exist_ok=True)
    n_eval = max(1, int(len(rows) * eval_percentage)) if len(rows) > 1 else 0
    splits = {"metadata_eval.csv": rows[:n_eval], "metadata_train.csv": rows[n_eval:]}
    paths = []
    for name, chunk in splits.items():
        path = os.path.join(out_path, name)
        with open(path, "w", newline="") as f:
            w = csv.writer(f, delimiter="|")
            w.writerow(["audio_file", "text", "speaker_name"])
            for row in chunk:
                w.writerow(row)
        paths.append(path)
    return paths[1], paths[0]  # train, eval


def format_audio_list(
    audio_files: List[str],
    target_language: str = "en",
    out_path: Optional[str] = None,
    eval_percentage: float = 0.15,
    speaker_name: str = "speaker",
    gradio_progress=None,
):
    """Transcribe + segment clips into a fine-tuning dataset (ref :47).

    Requires `faster_whisper` (not bundled); raises with guidance otherwise.
    """
    try:
        from faster_whisper import WhisperModel
    except ImportError as e:
        raise RuntimeError(
            " [!] format_audio_list needs the `faster-whisper` package for transcription. "
            "Install it, or provide metadata CSVs directly (audio_file|text|speaker_name)."
        ) from e

    asr_model = WhisperModel("large-v2", device="cpu", compute_type="int8")
    rows = []
    for audio_path in audio_files:
        segments, _ = asr_model.transcribe(audio_path, language=target_language)
        text = " ".join(seg.text.strip() for seg in segments).strip()
        if text:
            rows.append((audio_path, text, speaker_name))
        if gradio_progress is not None:
            gradio_progress(len(rows) / max(len(audio_files), 1))
    train_csv, eval_csv = write_metadata(rows, out_path or ".", eval_percentage)
    total_sec = 0.0
    return train_csv, eval_csv, total_sec
