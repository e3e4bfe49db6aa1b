"""Torch-Hub-style entry point (mirror of /root/reference/hubconf.py).

    synthesizer = hub_load("tts_models/en/ljspeech/vits")
"""

dependencies = ["jax", "flax", "numpy"]


def tts(model_name="tts_models/en/ljspeech/vits", vocoder_name=None, use_cuda=False):
    """Load a released model by zoo name → ready `Synthesizer`.

    Example:
        >>> synthesizer = torch.hub.load('<repo>', 'tts', source='local')
        >>> wavs = synthesizer.tts("This is a test!")
    """
    from tpu_tts.infer.synthesizer import Synthesizer
    from tpu_tts.zoo.manage import ModelManager

    manager = ModelManager()
    model_path, config_path, _ = manager.download_model(model_name)
    vocoder_path, vocoder_config_path = None, None
    if vocoder_name is not None:
        vocoder_path, vocoder_config_path, _ = manager.download_model(vocoder_name)
    return Synthesizer(
        tts_checkpoint=model_path,
        tts_config_path=config_path,
        vocoder_checkpoint=vocoder_path,
        vocoder_config=vocoder_config_path,
    )
