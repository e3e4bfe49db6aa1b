"""Prepare VoxCeleb 1/2 metadata for encoder training.

Parity tool for /root/reference/TTS/encoder/utils/prepare_voxceleb.py
(`convert_audio_and_make_label`:146, `processor`:194): walks an extracted
VoxCeleb subset tree (`<dir>/<subset>/<speaker>/<video>/<clip>.wav|.m4a`),
optionally decodes .m4a to .wav with ffmpeg, and writes one tab-separated
CSV per subset with the reference's four columns:

    wav_filename \t wav_length_ms \t speaker_id \t speaker_name

(the reference writes the raw SAMPLE COUNT into the `wav_length_ms` column,
prepare_voxceleb.py:183 — kept bug-compatible so downstream consumers of
either file agree). Speaker ids are assigned in discovery order and shared
across subsets prepared in one invocation, like the reference's global
`speaker_id_dict`.

The reference also downloads/extracts the archives first; this environment
has no network egress, so downloading is opt-in (`--download`) and fails
with a clear message when unreachable — point the tool at already-extracted
trees instead.
"""

import argparse
import csv
import os
import subprocess
import sys
import wave

SUBSETS = ("vox1_dev_wav", "vox1_test_wav", "vox2_dev_aac", "vox2_test_aac")


def _wav_n_samples(path: str) -> int:
    try:
        with wave.open(path, "rb") as f:
            return f.getnframes()
    except (wave.Error, EOFError):
        # non-PCM or float wavs: fall back to the framework loader
        from tpu_tts.audio.numpy_transforms import load_wav

        return int(load_wav(filename=path).shape[0])


def _decode_m4a(m4a_file: str, wav_file: str) -> bool:
    """ffmpeg decode, mirroring ref decode_aac_with_ffmpeg:128."""
    try:
        ret = subprocess.run(
            ["ffmpeg", "-i", m4a_file, wav_file],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, check=False,
        ).returncode
    except FileNotFoundError:
        print(" [!] ffmpeg not found — cannot decode .m4a", file=sys.stderr)
        return False
    return ret == 0


def make_label_csv(input_dir, subset, output_dir, output_file, speaker_id_dict):
    """Walk `<input_dir>/<subset>`, decode .m4a when needed, and write the
    4-column TSV (ref convert_audio_and_make_label:146)."""
    source_dir = os.path.join(input_dir, subset)
    rows = []
    for root, _, filenames in sorted(os.walk(source_dir)):
        for filename in sorted(filenames):
            name, ext = os.path.splitext(filename)
            if ext.lower() == ".wav":
                if os.path.splitext(name)[1]:
                    continue  # skip the "<clip>.m4a.wav" decode products
                wav_file = os.path.join(root, filename)
            elif ext.lower() == ".m4a":
                m4a_file = os.path.join(root, filename)
                wav_file = m4a_file + ".wav"
                if not os.path.exists(wav_file) and not _decode_m4a(m4a_file, wav_file):
                    raise RuntimeError(f"audio decoding failed: {m4a_file}")
            else:
                continue
            speaker_name = root.split(os.path.sep)[-2]
            if speaker_name not in speaker_id_dict:
                # max+1, not len(): ids folded in from a pre-existing CSV
                # (skipped subset) may be non-dense
                nxt = (max(speaker_id_dict.values()) + 1) if speaker_id_dict else 0
                speaker_id_dict[speaker_name] = nxt
            rows.append((
                os.path.abspath(wav_file),
                _wav_n_samples(wav_file),
                speaker_id_dict[speaker_name],
                speaker_name,
            ))
    csv_path = os.path.join(output_dir, output_file)
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f, delimiter="\t")
        w.writerow(["wav_filename", "wav_length_ms", "speaker_id", "speaker_name"])
        w.writerows(rows)
    print(f" > wrote {len(rows)} rows to {csv_path}")
    return csv_path


def _load_ids(csv_path, speaker_id_dict):
    """Fold an existing CSV's name→id pairs into the shared dict, so a
    skipped subset still reserves its ids and later subsets in the same
    invocation don't renumber from 0 (colliding with the existing file)."""
    with open(csv_path, newline="") as f:
        for row in list(csv.reader(f, delimiter="\t"))[1:]:
            speaker_id_dict.setdefault(row[3], int(row[2]))


def processor(directory, subset, force_process=False, speaker_id_dict=None):
    """Prepare one subset (ref processor:194, minus the download leg)."""
    subset_csv = os.path.join(directory, subset + ".csv")
    if not force_process and os.path.exists(subset_csv):
        if speaker_id_dict is not None:
            _load_ids(subset_csv, speaker_id_dict)
        return subset_csv
    if not os.path.isdir(os.path.join(directory, subset)):
        raise FileNotFoundError(
            f"{os.path.join(directory, subset)} not found — extract the "
            "VoxCeleb archives there first (no-egress environments cannot "
            "download; see --download)"
        )
    return make_label_csv(
        directory, subset, directory, subset + ".csv",
        speaker_id_dict if speaker_id_dict is not None else {},
    )


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Write VoxCeleb encoder-training metadata CSVs "
        "(reference-compatible 4-column TSV) from extracted subset trees."
    )
    parser.add_argument("directory", help="root holding <subset>/ trees")
    parser.add_argument("--subsets", nargs="+", default=list(SUBSETS), choices=SUBSETS)
    parser.add_argument("--force", action="store_true", help="rebuild existing CSVs")
    parser.add_argument(
        "--download", action="store_true",
        help="attempt the reference's archive download first (needs network "
        "egress + VoxCeleb credentials; unavailable in offline environments)",
    )
    args = parser.parse_args(argv)
    if args.download:
        parser.error(
            "--download is not supported in this build (no network egress); "
            "download and extract the archives with the official tooling, "
            "then re-run on the extracted tree"
        )
    speaker_id_dict = {}
    # pre-scan EVERY existing subset CSV (not only the requested ones) so a
    # fresh subset never reuses ids an earlier run assigned — regardless of
    # processing order within this invocation
    for subset in SUBSETS:
        existing = os.path.join(args.directory, subset + ".csv")
        if os.path.exists(existing) and not (args.force and subset in args.subsets):
            _load_ids(existing, speaker_id_dict)
    for subset in args.subsets:
        processor(args.directory, subset, args.force, speaker_id_dict)


if __name__ == "__main__":
    main()
