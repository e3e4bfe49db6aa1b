"""ModelManager: the model zoo — download, cache, and catalogue released
models.

Mirror of /root/reference/TTS/utils/manage.py:30 (`download_model`:371,
`_update_paths`:463). The registry (`models.json`) is the public release-URL
index shared with the reference ecosystem (data, not code). Downloaded torch
checkpoints are ingested through `tpu_tts.train.torch_convert` converters.
"""

import json
import os
import re
import tarfile
import zipfile
from pathlib import Path
from shutil import copyfile, rmtree
from typing import Dict, List, Tuple

from tpu_tts.utils.generic_utils import get_user_data_dir

FAIRSEQ_URI_PREFIX = "https://coqui.gateway.scarf.sh/fairseq/"

LICENSE_URLS = {
    "cc by-nc-nd 4.0": "https://creativecommons.org/licenses/by-nc-nd/4.0/",
    "mpl": "https://www.mozilla.org/en-US/MPL/2.0/",
    "mpl2": "https://www.mozilla.org/en-US/MPL/2.0/",
    "mpl 2.0": "https://www.mozilla.org/en-US/MPL/2.0/",
    "mit": "https://choosealicense.com/licenses/mit/",
    "apache 2.0": "https://choosealicense.com/licenses/apache-2.0/",
    "apache2": "https://choosealicense.com/licenses/apache-2.0/",
    "cc-by-sa 4.0": "https://creativecommons.org/licenses/by-sa/4.0/",
    "cpml": "https://coqui.ai/cpml/",
}


class ModelManager:
    def __init__(self, models_file: str = None, output_prefix: str = None, progress_bar: bool = False, verbose: bool = True):
        self.progress_bar = progress_bar
        self.verbose = verbose
        if output_prefix is None:
            self.output_prefix = get_user_data_dir("tts")
        else:
            self.output_prefix = Path(output_prefix) / "tts"
        self.models_file = models_file or os.path.join(os.path.dirname(__file__), "models.json")
        self.models_dict = self.read_models_file()

    def read_models_file(self) -> Dict:
        with open(self.models_file, "r", encoding="utf-8") as f:
            return json.load(f)

    # ------------------------------------------------------------- catalogue
    def _list_models(self, model_type: str, model_count: int = 0) -> List[str]:
        model_list = []
        for lang in self.models_dict[model_type]:
            for dataset in self.models_dict[model_type][lang]:
                for model in self.models_dict[model_type][lang][dataset]:
                    model_full_name = f"{model_type}--{lang}--{dataset}--{model}"
                    output_path = Path(self.output_prefix) / model_full_name
                    downloaded = "[already downloaded]" if output_path.is_dir() else ""
                    if self.verbose:
                        print(f" {model_count}: {model_type}/{lang}/{dataset}/{model} {downloaded}")
                    model_list.append(f"{model_type}/{lang}/{dataset}/{model}")
                    model_count += 1
        return model_list

    def list_models(self) -> List[str]:
        models = []
        for model_type in self.models_dict:
            models += self._list_models(model_type, len(models))
        return models

    def list_tts_models(self):
        return self._list_models("tts_models")

    def list_vocoder_models(self):
        return self._list_models("vocoder_models")

    def list_vc_models(self):
        return self._list_models("voice_conversion_models")

    def list_langs(self):
        for model_type in self.models_dict:
            print(f" Name format: {model_type}/language")
            for lang in self.models_dict[model_type]:
                print(f" >: {model_type}/{lang} ")

    def list_datasets(self):
        for model_type in self.models_dict:
            for lang in self.models_dict[model_type]:
                for dataset in self.models_dict[model_type][lang]:
                    print(f" >: {model_type}/{lang}/{dataset}")

    def model_info_by_idx(self, model_query: str):
        model_name_list = []
        model_type, model_query_idx = model_query.split("/")
        try:
            model_query_idx = int(model_query_idx)
            if model_query_idx <= 0:
                print("> model_query_idx should be a positive integer!")
                return
        except (TypeError, ValueError):
            print("> model_query_idx should be an integer!")
            return
        model_count = 0
        if model_type in self.models_dict:
            for lang in self.models_dict[model_type]:
                for dataset in self.models_dict[model_type][lang]:
                    for model in self.models_dict[model_type][lang][dataset]:
                        model_name_list.append(f"{model_type}/{lang}/{dataset}/{model}")
                        model_count += 1
        else:
            print(f"> model_type {model_type} does not exist in the list.")
            return
        if model_query_idx > model_count:
            print(f"model query idx exceeds the number of available models [{model_count}]")
            return
        model_type, lang, dataset, model = model_name_list[model_query_idx - 1].split("/")
        print(f"> model type : {model_type}")
        print(f"> language supported : {lang}")
        print(f"> dataset used : {dataset}")
        print(f"> model name : {model}")
        info = self.models_dict[model_type][lang][dataset][model]
        if "description" in info:
            print(f"> description : {info['description']}")

    def model_info_by_full_name(self, model_query_name: str):
        model_type, lang, dataset, model = model_query_name.split("/")
        try:
            info = self.models_dict[model_type][lang][dataset][model]
        except KeyError:
            print(f"> model {model_query_name} does not exist in the registry.")
            return
        for key in ("description", "default_vocoder", "license", "author"):
            if key in info:
                print(f"> {key} : {info[key]}")

    # -------------------------------------------------------------- download
    def _set_model_item(self, model_name: str):
        model_type, lang, dataset, model = model_name.split("/")
        model_full_name = f"{model_type}--{lang}--{dataset}--{model}"
        if "fairseq" in model_name:
            # fairseq-MMS VITS releases are addressed `tts_models/<lang>/fairseq/vits`
            # and are not listed in models.json (ref manage.py:262)
            model_item = {
                "model_type": "tts_models",
                "license": "CC BY-NC 4.0",
                "default_vocoder": None,
                "author": "fairseq",
                "description": "fairseq-MMS VITS (https://github.com/facebookresearch/fairseq/tree/main/examples/mms)",
                "github_rls_url": f"{FAIRSEQ_URI_PREFIX}{lang}.tar.gz",
            }
            return model_item, model_full_name, model
        model_item = dict(self.models_dict[model_type][lang][dataset][model])
        model_item["model_type"] = model_type
        return model_item, model_full_name, model

    @staticmethod
    def ask_tos(model_full_path):
        """Prompt the user to agree license terms for gated models."""
        tos_path = os.path.join(model_full_path, "tos_agreed.txt")
        if os.path.exists(tos_path):
            return True
        print(" > You must confirm the following:")
        print(' | > "I have purchased a commercial license from Coqui or I agree to the terms of the CPML."')
        answer = input(" | | > Please answer [y/n]: ").lower()
        if answer == "y":
            os.makedirs(model_full_path, exist_ok=True)
            with open(tos_path, "w", encoding="utf-8") as f:
                f.write("I agree.")
            return True
        return False

    def download_model(self, model_name: str) -> Tuple[str, str, Dict]:
        """Download (or find cached) a released model; returns (model_path,
        config_path, model_item)."""
        model_item, model_full_name, model = self._set_model_item(model_name)
        output_path = os.path.join(self.output_prefix, model_full_name)
        if os.path.exists(output_path):
            if self.verbose:
                print(f" > {model_name} is already downloaded.")
        else:
            os.makedirs(output_path, exist_ok=True)
            url = model_item.get("github_rls_url") or model_item.get("hf_url")
            if url is None:
                raise ValueError(f" [!] No download URL for {model_name}")
            if "cpml" in str(model_item.get("license", "")).lower():
                if not self.ask_tos(output_path):
                    rmtree(output_path, ignore_errors=True)
                    raise RuntimeError(" [!] License terms not agreed; aborting download.")
            try:
                if isinstance(url, list):
                    for u in url:
                        self._download_file(u, output_path)
                else:
                    self._download_zip_or_tar(url, output_path)
            except Exception:
                rmtree(output_path, ignore_errors=True)
                raise
        if "fairseq" in model_name or isinstance(model_item.get("hf_url"), list):
            # multi-file releases: the model loads itself from the directory
            # (ref manage.py:417-424)
            return output_path, None, model_item
        output_model_path, output_config_path = self._find_files(output_path)
        self._update_paths(output_path, output_config_path)
        return output_model_path, output_config_path, model_item

    def _download_zip_or_tar(self, url: str, output_path: str):
        import requests

        if self.verbose:
            print(f" > Downloading model to {output_path}")
        r = requests.get(url, stream=True, timeout=300)
        r.raise_for_status()
        tmp = os.path.join(output_path, url.split("/")[-1])
        with open(tmp, "wb") as f:
            for chunk in r.iter_content(chunk_size=1024 * 1024):
                f.write(chunk)
        if tmp.endswith(".zip"):
            with zipfile.ZipFile(tmp) as z:
                z.extractall(output_path)
            inner = [p for p in Path(output_path).iterdir() if p.is_dir()]
            for d in inner:
                for f_ in d.iterdir():
                    copyfile(str(f_), os.path.join(output_path, f_.name))
                rmtree(str(d), ignore_errors=True)
        elif tmp.endswith(".tar.bz2") or tmp.endswith(".tar.gz"):
            with tarfile.open(tmp) as t:
                t.extractall(output_path)
                tar_names = t.getnames()
            # releases wrap their files in one top-level dir — flatten it
            # (ref manage.py:587-593)
            top = os.path.join(output_path, tar_names[0]) if tar_names else ""
            if top and os.path.isdir(top):
                for name in os.listdir(top):
                    src = os.path.join(top, name)
                    dst = os.path.join(output_path, os.path.basename(name))
                    if src != dst and os.path.isfile(src):
                        copyfile(src, dst)
                rmtree(top, ignore_errors=True)
        if os.path.exists(tmp) and (tmp.endswith(".zip") or ".tar" in tmp):
            os.remove(tmp)

    def _download_file(self, url: str, output_path: str):
        import requests

        r = requests.get(url, stream=True, timeout=300)
        r.raise_for_status()
        with open(os.path.join(output_path, url.split("/")[-1]), "wb") as f:
            for chunk in r.iter_content(chunk_size=1024 * 1024):
                f.write(chunk)

    @staticmethod
    def _find_files(output_path: str) -> Tuple[str, str]:
        model_file, config_file = None, None
        for name in os.listdir(output_path):
            if name in ("model_file.pth", "model_file.pth.tar", "model.pth", "checkpoint.pth"):
                model_file = os.path.join(output_path, name)
            elif name == "config.json":
                config_file = os.path.join(output_path, name)
        if model_file is None:
            # orbax dir checkpoints
            for name in os.listdir(output_path):
                if name.startswith("checkpoint_") or name.startswith("best_model"):
                    model_file = os.path.join(output_path, name)
                    break
        if model_file is None:
            raise ValueError(" [!] Model file not found in the output path")
        if config_file is None:
            raise ValueError(" [!] Config file not found in the output path")
        return model_file, config_file

    @staticmethod
    def _update_path(field_name: str, new_path: str, config: Dict):
        if "." in field_name:
            fields = field_name.split(".")
            conf = config
            for fd in fields[:-1]:
                if fd not in conf:
                    return
                conf = conf[fd]
            if fields[-1] in conf and conf[fields[-1]]:
                conf[fields[-1]] = new_path
        elif field_name in config and config[field_name]:
            config[field_name] = new_path

    def _update_paths(self, output_path: str, config_path: str):
        """Rewrite auxiliary file paths inside a downloaded config
        (ref manage.py:463)."""
        output_stats_path = os.path.join(output_path, "scale_stats.npy")
        output_d_vector_file_path = os.path.join(output_path, "speakers.json")
        output_d_vector_file_pth_path = os.path.join(output_path, "speakers.pth")
        output_speaker_ids_file_path = os.path.join(output_path, "speaker_ids.json")
        output_speaker_ids_file_pth_path = os.path.join(output_path, "speaker_ids.pth")
        if not os.path.exists(config_path):
            return
        with open(config_path, "r", encoding="utf-8") as f:
            config = json.load(f)
        for field, path in (
            ("audio.stats_path", output_stats_path),
            ("d_vector_file", output_d_vector_file_path if os.path.exists(output_d_vector_file_path) else output_d_vector_file_pth_path),
            ("model_args.d_vector_file", output_d_vector_file_path if os.path.exists(output_d_vector_file_path) else output_d_vector_file_pth_path),
            ("speakers_file", output_speaker_ids_file_path if os.path.exists(output_speaker_ids_file_path) else output_speaker_ids_file_pth_path),
            ("model_args.speakers_file", output_speaker_ids_file_path if os.path.exists(output_speaker_ids_file_path) else output_speaker_ids_file_pth_path),
        ):
            self._update_path(field, path, config)
        with open(config_path, "w", encoding="utf-8") as f:
            json.dump(config, f, indent=4)
