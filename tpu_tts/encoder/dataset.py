"""Speaker-encoder dataset: class-balanced utterance sampling + optional
audio augmentation (mirror of /root/reference/TTS/encoder/dataset.py)."""

import random
from typing import Dict, List

import numpy as np


class EncoderDataset:
    def __init__(
        self,
        config,
        ap,
        meta_data: List[Dict],
        voice_len: float = 1.6,
        num_classes_in_batch: int = 8,
        num_utter_per_class: int = 4,
        augmentation_config: Dict = None,
        use_torch_spec: bool = False,
        label_key: str = "speaker_name",
    ):
        self.config = config
        self.ap = ap
        self.items = [it for it in meta_data if it.get(label_key)]
        self.seq_len = int(voice_len * ap.sample_rate)
        self.num_classes_in_batch = num_classes_in_batch
        self.num_utter_per_class = num_utter_per_class
        self.label_key = label_key
        self.classname_to_classid = {
            name: i for i, name in enumerate(sorted({it[label_key] for it in self.items}))
        }
        # augmentation (additive noise / RIR from config paths)
        self.augmentator = None
        self.gaussian_augmentation_config = None
        if augmentation_config:
            self.data_augmentation_p = augmentation_config.get("p", 0.0)
            if self.data_augmentation_p and ("additive" in augmentation_config or "rir" in augmentation_config):
                self.augmentator = AugmentWAV(ap, augmentation_config)
            if "gaussian" in augmentation_config:
                self.gaussian_augmentation_config = augmentation_config["gaussian"]

    def __len__(self):
        return len(self.items)

    @property
    def num_classes(self):
        return len(self.classname_to_classid)

    def get_class_list(self):
        return list(self.classname_to_classid.keys())

    def load_wav(self, path):
        return np.asarray(self.ap.load_wav(path), dtype=np.float32)

    def __getitem__(self, idx):
        item = self.items[idx]
        wav = self.load_wav(item["audio_file"])
        if len(wav) < self.seq_len:
            wav = np.pad(wav, (0, self.seq_len - len(wav)))
        offset = random.randint(0, max(len(wav) - self.seq_len, 0))
        wav = wav[offset : offset + self.seq_len]
        if self.augmentator is not None and self.data_augmentation_p:
            if random.random() < self.data_augmentation_p:
                wav = self.augmentator.apply_one(wav)
        if self.gaussian_augmentation_config and random.random() < self.gaussian_augmentation_config.get("p", 0):
            wav = wav + np.random.normal(
                self.gaussian_augmentation_config.get("offset", 0),
                self.gaussian_augmentation_config.get("std", 0.01),
                size=len(wav),
            ).astype(np.float32)
        return {
            "wav": wav,
            "class_name": item[self.label_key],
            "class_id": self.classname_to_classid[item[self.label_key]],
        }

    def collate_fn(self, batch):
        wavs = np.stack([b["wav"] for b in batch])
        labels = np.array([b["class_id"] for b in batch], dtype=np.int32)
        return {"wavs": wavs, "labels": labels}


class AugmentWAV:
    """Additive noise / RIR convolution augmentation (ref encoder/dataset.py)."""

    def __init__(self, ap, augmentation_config: Dict):
        import glob
        import os

        self.ap = ap
        self.additive_config = augmentation_config.get("additive", {})
        self.rir_config = augmentation_config.get("rir", {})
        self.noise_list = {}
        if self.additive_config:
            path = self.additive_config.get("sounds_path", "")
            for t in self.additive_config:
                if isinstance(self.additive_config[t], dict):
                    self.noise_list[t] = glob.glob(os.path.join(path, t, "**/*.wav"), recursive=True)
        self.rir_files = []
        if self.rir_config:
            self.rir_files = glob.glob(
                os.path.join(self.rir_config.get("rir_path", ""), "**/*.wav"), recursive=True
            )

    def additive_noise(self, noise_type, audio):
        cfg = self.additive_config[noise_type]
        clean_db = 10 * np.log10(np.mean(audio**2) + 1e-4)
        files = self.noise_list.get(noise_type)
        if not files:
            return audio
        noise = np.asarray(self.ap.load_wav(random.choice(files)), dtype=np.float32)
        if len(noise) < len(audio):
            noise = np.tile(noise, int(np.ceil(len(audio) / len(noise))))
        noise = noise[: len(audio)]
        snr = random.uniform(cfg.get("min_snr_in_db", 0), cfg.get("max_snr_in_db", 15))
        noise_db = 10 * np.log10(np.mean(noise**2) + 1e-4)
        noise = np.sqrt(10 ** ((clean_db - noise_db - snr) / 10)) * noise
        return audio + noise

    def reverberate(self, audio):
        if not self.rir_files:
            return audio
        from scipy.signal import fftconvolve

        rir = np.asarray(self.ap.load_wav(random.choice(self.rir_files)), dtype=np.float32)
        rir = rir / np.sqrt(np.sum(rir**2) + 1e-9)
        return fftconvolve(audio, rir, mode="full")[: len(audio)]

    def apply_one(self, audio):
        if self.noise_list and (not self.rir_files or random.random() < 0.75):
            return self.additive_noise(random.choice(list(self.noise_list.keys())), audio)
        return self.reverberate(audio)
