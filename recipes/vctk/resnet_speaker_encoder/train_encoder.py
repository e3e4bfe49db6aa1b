"""VCTK ResNet speaker-encoder recipe (behavioral mirror of /root/reference/recipes/vctk/resnet_speaker_encoder/train_encoder.py, on the
tpu_tts trainer)."""

import os

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

from tpu_tts.config.shared_configs import BaseDatasetConfig
from tpu_tts.encoder.configs import SpeakerEncoderConfig

CURRENT_PATH = os.path.dirname(os.path.abspath(__file__))
VCTK_PATH = os.path.join(CURRENT_PATH, "../VCTK/")  # pre-resample to 16 kHz + VAD-trim for best results
OUTPUT_PATH = os.path.join(CURRENT_PATH, "resnet_speaker_encoder_training_output/")
CONFIG_OUT_PATH = os.path.join(OUTPUT_PATH, "config_se.json")
RESTORE_PATH = None  # checkpoint for transfer learning, or None

config = SpeakerEncoderConfig()
config.datasets = [BaseDatasetConfig(formatter="vctk", meta_file_train="", language="en-us", path=VCTK_PATH)]
config.num_classes_in_batch = 100
config.num_utter_per_class = 4
config.eval_num_classes_in_batch = 100
config.eval_num_utter_per_class = 4
config.num_loader_workers = 8
config.epochs = 10000
config.loss = "softmaxproto"
config.run_eval = False
config.output_path = OUTPUT_PATH
config.save_step = 2000
config.model_params = {
    "model_name": "resnet",
    "input_dim": 64,
    "use_torch_spec": True,
    "log_input": True,
    "proj_dim": 512,
}
config.voice_len = 2.0
config.audio.fft_size = 512
config.audio.win_length = 400
config.audio.hop_length = 160
config.audio.sample_rate = 16000
config.audio.preemphasis = 0.97
config.audio.num_mels = 64

if __name__ == "__main__":
    os.makedirs(OUTPUT_PATH, exist_ok=True)
    config.save_json(CONFIG_OUT_PATH)
    from tpu_tts.bin.train_encoder import main as train_encoder_main

    argv = ["--config_path", CONFIG_OUT_PATH]
    if RESTORE_PATH:
        argv += ["--restore_path", RESTORE_PATH]
    train_encoder_main(argv)
