"""`tts` CLI — synthesize speech from the command line.

Mirror of /root/reference/TTS/bin/synthesize.py:144 (model zoo + local
checkpoints, vocoder pairing, multi-speaker, voice conversion, pipe-out).
"""

import argparse
import sys
from pathlib import Path

from tpu_tts.parallel import maybe_force_platform

maybe_force_platform()

description = """Synthesize speech on the command line.

Examples:
  # local model
  tts --text "Hello." --model_path ckpt_dir --config_path config.json --out_path out.wav
  # with an external vocoder
  tts --text "Hello." --model_path ckpt --config_path cfg.json \\
      --vocoder_path voc_ckpt --vocoder_config_path voc_cfg.json --out_path out.wav
  # zoo model
  tts --text "Hello." --model_name tts_models/en/ljspeech/glow-tts --out_path out.wav
  # list models / speakers
  tts --list_models
  tts --model_path ckpt --config_path cfg.json --list_speaker_idxs
"""


def str2bool(v):
    if isinstance(v, bool):
        return v
    return v.lower() in ("yes", "true", "t", "y", "1")


def make_parser():
    parser = argparse.ArgumentParser(description=description, formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("--text", type=str, default=None, help="Text to synthesize.")
    parser.add_argument("--list_models", action="store_true", help="List released models from the zoo.")
    parser.add_argument("--model_info_by_idx", type=str, default=None)
    parser.add_argument("--model_info_by_name", type=str, default=None)
    parser.add_argument("--model_name", type=str, default=None, help="Zoo model name.")
    parser.add_argument("--vocoder_name", type=str, default=None)
    parser.add_argument("--config_path", type=str, default=None)
    parser.add_argument("--model_path", type=str, default=None)
    parser.add_argument("--out_path", type=str, default="tts_output.wav")
    parser.add_argument("--use_cuda", type=str2bool, default=False, help="Accepted for compat (JAX manages devices).")
    parser.add_argument("--vocoder_path", type=str, default=None)
    parser.add_argument("--vocoder_config_path", type=str, default=None)
    parser.add_argument("--encoder_path", type=str, default=None)
    parser.add_argument("--encoder_config_path", type=str, default=None)
    parser.add_argument("--pipe_out", action="store_true", help="Pipe the wav to stdout for shell pipes.")
    # multi-speaker / multi-lingual
    parser.add_argument("--speaker_idx", type=str, default=None)
    parser.add_argument("--language_idx", type=str, default=None)
    parser.add_argument("--speakers_file_path", type=str, default=None)
    parser.add_argument("--language_ids_file_path", type=str, default=None)
    parser.add_argument("--list_speaker_idxs", action="store_true")
    parser.add_argument("--list_language_idxs", action="store_true")
    parser.add_argument("--speaker_wav", nargs="+", default=None)
    parser.add_argument("--capacitron_style_wav", type=str, default=None)
    parser.add_argument("--capacitron_style_text", type=str, default=None)
    parser.add_argument("--gst_style", type=str, default=None, help="Wav path (or style-token JSON) for GST style reference.")
    parser.add_argument("--save_spectogram", type=bool, default=False, help="Accepted for reference-CLI compat.")
    parser.add_argument("--device", type=str, default="cpu", help="Accepted for reference-CLI compat; JAX manages devices.")
    # voice conversion
    parser.add_argument("--reference_wav", type=str, default=None)
    parser.add_argument("--reference_speaker_idx", type=str, default=None)
    parser.add_argument("--source_wav", type=str, default=None)
    parser.add_argument("--target_wav", type=str, default=None)
    parser.add_argument("--voice_dir", type=str, default=None)
    parser.add_argument("--progress_bar", type=str2bool, default=True)
    return parser


def main(argv=None):
    args = make_parser().parse_args(argv)

    pipe_out = sys.stdout if args.pipe_out else None

    if args.list_models or args.model_info_by_idx or args.model_info_by_name or args.model_name:
        from tpu_tts.zoo.manage import ModelManager

        manager = ModelManager(progress_bar=args.progress_bar)
        if args.list_models:
            manager.list_models()
            return
        if args.model_info_by_idx:
            manager.model_info_by_idx(args.model_info_by_idx)
            return
        if args.model_info_by_name:
            manager.model_info_by_full_name(args.model_info_by_name)
            return
        if args.model_name and not args.model_path:
            model_path, config_path, model_item = manager.download_model(args.model_name)
            args.model_path, args.config_path = model_path, config_path
            vocoder_name = args.vocoder_name or model_item.get("default_vocoder")
            if vocoder_name and not args.vocoder_path:
                args.vocoder_path, args.vocoder_config_path, _ = manager.download_model(vocoder_name)

    from tpu_tts.infer.synthesizer import Synthesizer

    synthesizer = Synthesizer(
        tts_checkpoint=args.model_path or "",
        tts_config_path=args.config_path or "",
        tts_speakers_file=args.speakers_file_path or "",
        tts_languages_file=args.language_ids_file_path or "",
        vocoder_checkpoint=args.vocoder_path or "",
        vocoder_config=args.vocoder_config_path or "",
        encoder_checkpoint=args.encoder_path or "",
        encoder_config=args.encoder_config_path or "",
    )

    if args.list_speaker_idxs:
        print(" > Available speaker ids:")
        print(synthesizer.speaker_manager.name_to_id if synthesizer.speaker_manager else {})
        return
    if args.list_language_idxs:
        print(" > Available language ids:")
        print(synthesizer.language_manager.name_to_id if synthesizer.language_manager else {})
        return

    if args.source_wav and args.target_wav:
        wav = synthesizer.voice_conversion(source_wav=args.source_wav, target_wav=args.target_wav)
    else:
        if not args.text and not args.reference_wav:
            print(" [!] Define `--text` to synthesize (or --source_wav/--target_wav for VC).")
            sys.exit(1)
        if args.text:
            print(f" > Text: {args.text}")
        style_wav = args.capacitron_style_wav or args.gst_style
        wav = synthesizer.tts(
            text=args.text or "",
            speaker_name=args.speaker_idx or "",
            language_name=args.language_idx or "",
            speaker_wav=args.speaker_wav,
            reference_wav=args.reference_wav,
            reference_speaker_name=args.reference_speaker_idx,
            style_wav=style_wav,
            style_text=args.capacitron_style_text,
        )

    print(f" > Saving output to {args.out_path}")
    synthesizer.save_wav(wav, args.out_path, pipe_out=pipe_out)


if __name__ == "__main__":
    main()
