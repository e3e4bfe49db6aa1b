"""Vocoder model registry (mirror of /root/reference/TTS/vocoder/models/
__init__.py: `setup_model`:12, `setup_generator`:36, `setup_discriminator`)."""

import importlib
import re


def to_camel(text):
    text = text.capitalize()
    return re.sub(r"(?!^)_([a-zA-Z])", lambda m: m.group(1).upper(), text)


def setup_model(config, samples=None):
    """Build a vocoder model from config; GAN wrapper when G+D are set."""
    if "discriminator_model" in config and config.discriminator_model:
        from tpu_tts.vocoder.models.gan import GAN

        return GAN.init_from_config(config=config, samples=samples)
    model_name = config.model.lower() if "model" in config and config.model else config.generator_model
    return _setup_by_name(model_name, config)


def _setup_by_name(name, config):
    mod = importlib.import_module("tpu_tts.vocoder.models." + name.replace("_generator", "").replace("_discriminator", ""))
    cls = getattr(mod, to_camel(name.replace("_generator", "").replace("_discriminator", "")))
    return cls.init_from_config(config=config)


def setup_generator(c):
    """Build a generator flax module from a GAN config (ref :36)."""
    name = c.generator_model
    base = name.lower().replace("_generator", "")
    if base in ("hifigan",):
        from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator

        import jax.numpy as jnp

        return HifiganGenerator(
            in_channels=c.audio.num_mels,
            out_channels=1,
            dtype=jnp.bfloat16 if getattr(c, "mixed_precision", False) else None,
            **{k: v for k, v in (c.generator_model_params or {}).items()},
        )
    if base in ("melgan", "fullband_melgan"):
        from tpu_tts.vocoder.models.melgan_generator import MelganGenerator

        p = c.generator_model_params or {}
        return MelganGenerator(
            in_channels=c.audio.num_mels,
            out_channels=1,
            upsample_factors=tuple(p.get("upsample_factors", (8, 8, 2, 2))),
            num_res_blocks=p.get("num_res_blocks", 3),
        )
    if base == "multiband_melgan":
        from tpu_tts.vocoder.models.melgan_generator import MelganGenerator

        p = c.generator_model_params or {}
        return MelganGenerator(
            in_channels=c.audio.num_mels,
            out_channels=4,
            proj_kernel=7,
            base_channels=384,
            upsample_factors=tuple(p.get("upsample_factors", (2, 8, 2, 2))),
            num_res_blocks=p.get("num_res_blocks", 4),
        )
    if base == "parallel_wavegan":
        from tpu_tts.vocoder.models.parallel_wavegan import ParallelWaveganGenerator

        p = c.generator_model_params or {}
        return ParallelWaveganGenerator(
            in_channels=1,
            out_channels=1,
            aux_channels=c.audio.num_mels,
            num_res_blocks=p.get("num_res_blocks", 30),
            stacks=p.get("stacks", 3),
            upsample_factors=tuple(p.get("upsample_factors", (4, 4, 4, 4))),
        )
    if base == "univnet":
        from tpu_tts.vocoder.models.univnet_generator import UnivnetGenerator

        p = c.generator_model_params or {}
        return UnivnetGenerator(
            in_channels=p.get("in_channels", 64),
            out_channels=p.get("out_channels", 1),
            hidden_channels=p.get("hidden_channels", 32),
            cond_channels=c.audio.num_mels,
            upsample_factors=tuple(p.get("upsample_factors", (8, 8, 4))),
            lvc_layers_each_block=p.get("lvc_layers_each_block", 4),
            lvc_kernel_size=p.get("lvc_kernel_size", 3),
            kpnet_hidden_channels=p.get("kpnet_hidden_channels", 64),
            kpnet_conv_size=p.get("kpnet_conv_size", 3),
        )
    raise NotImplementedError(f" [!] Generator model {name} is not implemented.")


def setup_discriminator(c):
    """Build a discriminator flax module from a GAN config."""
    name = c.discriminator_model
    base = name.lower().replace("_discriminator", "")
    if base == "hifigan":
        from tpu_tts.vocoder.models.hifigan_discriminator import HifiganDiscriminator

        import jax.numpy as jnp

        return HifiganDiscriminator(
            dtype=jnp.bfloat16 if getattr(c, "mixed_precision", False) else None
        )
    if base == "melgan_multiscale":
        from tpu_tts.vocoder.models.melgan_discriminator import MelganMultiscaleDiscriminator

        p = c.discriminator_model_params or {}
        return MelganMultiscaleDiscriminator(
            base_channels=p.get("base_channels", 16),
            max_channels=p.get("max_channels", 1024),
            downsample_factors=tuple(p.get("downsample_factors", (4, 4, 4))),
        )
    if base == "univnet":
        from tpu_tts.vocoder.models.univnet_discriminator import UnivnetDiscriminator

        return UnivnetDiscriminator()
    if base == "parallel_wavegan":
        from tpu_tts.vocoder.models.parallel_wavegan import ParallelWaveganDiscriminator

        return ParallelWaveganDiscriminator()
    if base == "random_window":
        from tpu_tts.vocoder.models.random_window_discriminator import RandomWindowDiscriminator

        p = c.discriminator_model_params or {}
        kw = {}
        for k in (
            "uncond_disc_downsample_factors",
            "cond_disc_downsample_factors",
            "cond_disc_out_channels",
            "window_sizes",
        ):
            if k in p:
                kw[k] = tuple(tuple(v) if isinstance(v, (list, tuple)) else v for v in p[k]) if isinstance(
                    p[k][0], (list, tuple)
                ) else tuple(p[k])
        return RandomWindowDiscriminator(
            cond_channels=c.audio.num_mels, hop_length=c.audio.hop_length, **kw
        )
    raise NotImplementedError(f" [!] Discriminator model {name} is not implemented.")
