"""Belarusian phonemization (mirror of /root/reference/TTS/tts/utils/text/
belarusian/phonemizer.py): delegates to the external `belarusian-text-normalizer`
fanetyka module, located via the BEL_FANETYKA_JAR environment variable in the
reference; here the python package is tried directly and a clear error raised
when unavailable."""


def belarusian_text_to_phonemes(text: str) -> str:
    try:
        from belarusian_fanetyka import fanetyka  # optional external package
    except ImportError as e:
        raise RuntimeError(
            " [!] Belarusian phonemization requires the `belarusian-fanetyka` package (or the reference's "
            "BEL_FANETYKA_JAR toolchain), which is not installed."
        ) from e
    return fanetyka(text)
