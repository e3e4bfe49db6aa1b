from tpu_tts.vc.configs.freevc_config import FreeVCConfig

__all__ = ["FreeVCConfig"]
