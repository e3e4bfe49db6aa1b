"""Speaker / language / embedding managers.

Mirror of /root/reference/TTS/tts/utils/managers.py (`BaseIDManager`:36,
`EmbeddingManager`:109) and speakers.py:14 / languages.py:13. Embedding files
are JSON or numpy-pickled dicts `{clip_name: {"name": ..., "embedding": [...]}}`
(the torch `.pth` variant is handled by the checkpoint converter).
"""

import json
import os
import random
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


def load_file(path: str):
    if path.endswith(".json"):
        with open(path, "r", encoding="utf-8") as f:
            return json.load(f)
    if path.endswith(".npy") or path.endswith(".npz"):
        return np.load(path, allow_pickle=True).item()
    if path.endswith(".pth"):
        import torch

        return torch.load(path, map_location="cpu", weights_only=False)
    raise ValueError(f" [!] Unsupported file type {path}")


def save_file(obj: Any, path: str):
    if path.endswith(".json"):
        with open(path, "w", encoding="utf-8") as f:
            json.dump(obj, f, indent=2)
    elif path.endswith(".npy"):
        np.save(path, obj, allow_pickle=True)
    elif path.endswith(".pth"):
        import torch

        torch.save(obj, path)
    else:
        raise ValueError(f" [!] Unsupported file type {path}")


class BaseIDManager:
    """name ↔ id mapping built from dataset samples or a stored file."""

    def __init__(self, id_file_path: str = ""):
        self.name_to_id: Dict[str, int] = {}
        if id_file_path:
            self.load_ids_from_file(id_file_path)

    @staticmethod
    def _parse_items_from_data(items: List, key: str) -> Dict[str, int]:
        names = sorted({item[key] for item in items if key in item})
        return {name: i for i, name in enumerate(names)}

    def set_ids_from_data(self, items: List, parse_key: str) -> None:
        self.name_to_id = self._parse_items_from_data(items, parse_key)

    def load_ids_from_file(self, file_path: str) -> None:
        self.name_to_id = load_file(file_path)

    def save_ids_to_file(self, file_path: str) -> None:
        save_file(self.name_to_id, file_path)

    @property
    def ids(self):
        return self.name_to_id

    def get_random_id(self) -> Any:
        if self.name_to_id:
            return self.name_to_id[random.choice(list(self.name_to_id.keys()))]
        return None


class EmbeddingManager(BaseIDManager):
    """d-vector store + (optionally) an attached speaker encoder."""

    def __init__(
        self,
        embedding_file_path: str = "",
        id_file_path: str = "",
        encoder_model_path: str = "",
        encoder_config_path: str = "",
    ):
        super().__init__(id_file_path)
        self.embeddings: Dict[str, Dict] = {}
        self.embeddings_by_name: Dict[str, List] = {}
        self.encoder = None
        self.encoder_ap = None
        if embedding_file_path:
            if isinstance(embedding_file_path, list):
                self.load_embeddings_from_list_of_files(embedding_file_path)
            else:
                self.load_embeddings_from_file(embedding_file_path)
        if encoder_model_path and encoder_config_path:
            self.init_encoder(encoder_model_path, encoder_config_path)

    @property
    def num_embeddings(self):
        return len(self.embeddings)

    @property
    def embedding_dim(self):
        if self.embeddings:
            return len(self.embeddings[list(self.embeddings.keys())[0]]["embedding"])
        return 0

    @property
    def embedding_names(self):
        return list(self.embeddings_by_name.keys())

    def _set_embeddings(self, embeddings: Dict):
        self.embeddings = embeddings
        speakers = sorted({x["name"] for x in self.embeddings.values()})
        self.name_to_id = {name: i for i, name in enumerate(speakers)}
        by_name: Dict[str, List] = {}
        for x in self.embeddings.values():
            by_name.setdefault(x["name"], []).append(x["embedding"])
        self.embeddings_by_name = by_name

    def load_embeddings_from_file(self, file_path: str):
        self._set_embeddings(load_file(file_path))

    def load_embeddings_from_list_of_files(self, file_paths: List[str]):
        all_embeddings: Dict = {}
        for path in file_paths:
            emb = load_file(path)
            all_embeddings.update(emb)
        self._set_embeddings(all_embeddings)

    def save_embeddings_to_file(self, file_path: str):
        save_file(self.embeddings, file_path)

    def embeddings_by_names(self) -> Dict[str, List]:
        return self.embeddings_by_name

    def get_embedding_by_clip(self, clip_idx: str) -> List:
        return self.embeddings[clip_idx]["embedding"]

    def get_embeddings_by_name(self, idx: str) -> List[List]:
        return self.embeddings_by_name[idx]

    def get_mean_embedding(self, idx: str, num_samples: Optional[int] = None, randomize: bool = False) -> np.ndarray:
        embeddings = np.array(self.get_embeddings_by_name(idx))
        if num_samples is None:
            return embeddings.mean(0)
        assert len(embeddings) >= num_samples, f" [!] {idx} has fewer embeddings than num_samples"
        if randomize:
            embeddings = np.random.permutation(embeddings)[:num_samples]
        else:
            embeddings = embeddings[:num_samples]
        return embeddings.mean(0)

    def get_random_embedding(self) -> Any:
        if self.embeddings:
            return self.embeddings[random.choice(list(self.embeddings.keys()))]["embedding"]
        return None

    def init_encoder(self, model_path: str, config_path: str) -> None:
        from tpu_tts.config import load_config
        from tpu_tts.encoder.models import setup_encoder_model

        self.encoder_config = load_config(config_path)
        self.encoder = setup_encoder_model(self.encoder_config)
        self.encoder.load_checkpoint(self.encoder_config, model_path, eval=True)
        from tpu_tts.audio import AudioProcessor

        self.encoder_ap = AudioProcessor.init_from_config(self.encoder_config, verbose=False)

    def compute_embedding_from_clip(self, wav_file) -> list:
        if self.encoder is None:
            raise RuntimeError(" [!] Speaker encoder not initialized.")
        files = wav_file if isinstance(wav_file, list) else [wav_file]
        embs = []
        for f in files:
            wav = self.encoder_ap.load_wav(f, sr=self.encoder_ap.sample_rate)
            embs.append(self.encoder.compute_embedding(wav))
        return np.stack(embs).mean(0).flatten().tolist()


class SpeakerManager(EmbeddingManager):
    """Speaker bookkeeping (ref speakers.py:14)."""

    def __init__(
        self,
        data_items: Optional[List] = None,
        d_vectors_file_path: str = "",
        speaker_id_file_path: str = "",
        encoder_model_path: str = "",
        encoder_config_path: str = "",
    ):
        super().__init__(
            embedding_file_path=d_vectors_file_path,
            id_file_path=speaker_id_file_path,
            encoder_model_path=encoder_model_path,
            encoder_config_path=encoder_config_path,
        )
        if data_items:
            self.set_ids_from_data(data_items, parse_key="speaker_name")

    @property
    def num_speakers(self):
        return len(self.name_to_id)

    @property
    def speaker_names(self):
        return list(self.name_to_id.keys())

    @staticmethod
    def init_from_config(config, samples: Optional[List] = None) -> Optional["SpeakerManager"]:
        speaker_manager = None
        if getattr(config, "use_speaker_embedding", False):
            if samples:
                speaker_manager = SpeakerManager(data_items=samples)
            if getattr(config, "speaker_file", None):
                speaker_manager = SpeakerManager(speaker_id_file_path=config.speaker_file)
            if getattr(config, "speakers_file", None):
                speaker_manager = SpeakerManager(speaker_id_file_path=config.speakers_file)
        if getattr(config, "use_d_vector_file", False):
            speaker_manager = SpeakerManager()
            if getattr(config, "d_vector_file", None):
                speaker_manager = SpeakerManager(d_vectors_file_path=config.d_vector_file)
        return speaker_manager


class LanguageManager(BaseIDManager):
    """Language bookkeeping (ref languages.py:13)."""

    def __init__(self, language_ids_file_path: str = "", config=None):
        super().__init__(id_file_path=language_ids_file_path)
        if config:
            self.set_language_ids_from_config(config)

    @property
    def num_languages(self):
        return len(self.name_to_id)

    @property
    def language_names(self):
        return list(self.name_to_id.keys())

    @staticmethod
    def parse_language_ids_from_config(c) -> Dict:
        languages = set()
        for dataset in c.datasets:
            if dataset.language:
                languages.add(dataset.language)
            else:
                raise ValueError(f" [!] Dataset {dataset.dataset_name} has no language specified.")
        return {name: i for i, name in enumerate(sorted(languages))}

    def set_language_ids_from_config(self, c) -> None:
        self.name_to_id = self.parse_language_ids_from_config(c)

    @staticmethod
    def init_from_config(config) -> Optional["LanguageManager"]:
        """Accepts the full model config (language flags may live on
        `model_args` while the dataset list lives at the top level)."""
        args = getattr(config, "model_args", None) or config
        if getattr(args, "use_language_embedding", False):
            if getattr(args, "language_ids_file", None):
                return LanguageManager(language_ids_file_path=args.language_ids_file)
            return LanguageManager(config=config if hasattr(config, "datasets") else None)
        return None


def _class_balancer_weights(names: np.ndarray) -> np.ndarray:
    """Inverse-frequency per-class sample weights, L2-normalized
    (ref TTS/tts/utils/speakers.py:213-222, languages.py:115-125)."""
    unique, counts = np.unique(names, return_counts=True)
    per_class = 1.0 / counts
    w = np.array([per_class[np.where(unique == n)[0][0]] for n in names], dtype=np.float64)
    return w / np.linalg.norm(w)


def get_speaker_balancer_weights(items: list) -> np.ndarray:
    return _class_balancer_weights(np.array([item["speaker_name"] for item in items]))


def get_language_balancer_weights(items: list) -> np.ndarray:
    return _class_balancer_weights(np.array([item["language"] for item in items]))


def get_length_balancer_weights(items: list, num_buckets: int = 10) -> np.ndarray:
    """Audio-duration bucket balancing (ref TTS/tts/utils/data.py:58-78):
    bucket durations into `num_buckets` equal-width classes, weight each
    sample by the inverse population of its bucket, L2-normalize."""
    import bisect

    lengths = np.array(
        [item.get("audio_length") or len(item.get("text", "")) for item in items], dtype=np.float64
    )
    max_length, min_length = int(lengths.max()), int(lengths.min())
    step = int((max_length - min_length) / num_buckets) + 1
    buckets_classes = [i + step for i in range(min_length, (max_length - step) + num_buckets + 1, step)]
    bucket_names = np.array([buckets_classes[bisect.bisect_left(buckets_classes, l)] for l in lengths])
    return _class_balancer_weights(bucket_names)
