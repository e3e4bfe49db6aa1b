from tpu_tts.vc.modules.wavlm import WavLM, WavLMConfig, convert_wavlm_torch_state_dict
