"""Gradio XTTS fine-tuning demo (mirror of /root/reference/TTS/demos/
xtts_ft_demo/xtts_demo.py): three tabs — dataset prep (whisper transcription),
GPT fine-tuning, and inference with the tuned model. Gradio is an optional
dependency; the module imports cleanly without it and `main()` raises with
guidance."""

import argparse
import os

from tpu_tts.demos.xtts_ft_demo.utils.formatter import format_audio_list, list_audios
from tpu_tts.demos.xtts_ft_demo.utils.gpt_train import train_gpt


def build_app(out_path: str):
    import gradio as gr  # optional dependency

    state = {"train_csv": None, "eval_csv": None, "ckpt": None, "config": None}

    def preprocess(audio_dir, language, progress=gr.Progress()):
        audios = list_audios(audio_dir)
        train_csv, eval_csv, _ = format_audio_list(
            audios, target_language=language, out_path=os.path.join(out_path, "dataset"),
            gradio_progress=progress,
        )
        state["train_csv"], state["eval_csv"] = train_csv, eval_csv
        return f"Dataset ready: {train_csv}"

    def finetune(language, epochs, batch_size):
        ckpt, cfg = train_gpt(
            language, int(epochs), int(batch_size), state["train_csv"], state["eval_csv"],
            os.path.join(out_path, "run"),
        )
        state["ckpt"], state["config"] = ckpt, cfg
        return f"Fine-tuned: {ckpt}"

    def tts(text, speaker_wav):
        from tpu_tts.infer.synthesizer import Synthesizer

        synth = Synthesizer(tts_checkpoint=state["ckpt"], tts_config_path=state["config"])
        wav = synth.tts(text, speaker_wav=speaker_wav)
        import numpy as np

        return (synth.output_sample_rate, np.asarray(wav, dtype=np.float32))

    with gr.Blocks() as demo:
        with gr.Tab("1 - Data processing"):
            audio_dir = gr.Textbox(label="Path to audio folder")
            lang = gr.Dropdown(["en", "es", "fr", "de", "it", "pt", "zh-cn", "ja"], value="en", label="Language")
            out1 = gr.Label()
            gr.Button("Create dataset").click(preprocess, [audio_dir, lang], out1)
        with gr.Tab("2 - Fine-tuning"):
            epochs = gr.Slider(1, 100, value=6, step=1, label="Epochs")
            bs = gr.Slider(1, 64, value=2, step=1, label="Batch size")
            out2 = gr.Label()
            gr.Button("Train").click(finetune, [lang, epochs, bs], out2)
        with gr.Tab("3 - Inference"):
            text = gr.Textbox(label="Text")
            spk = gr.Audio(type="filepath", label="Reference speaker wav")
            audio_out = gr.Audio(label="Synthesized")
            gr.Button("Synthesize").click(tts, [text, spk], audio_out)
    return demo


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=5003)
    parser.add_argument("--out_path", type=str, default="xtts_ft")
    args = parser.parse_args(argv)
    try:
        import gradio  # noqa: F401
    except ImportError as e:
        raise RuntimeError(
            " [!] The XTTS fine-tune demo UI needs the `gradio` package. The underlying pipeline is "
            "importable without it: tpu_tts.demos.xtts_ft_demo.utils.{formatter,gpt_train}."
        ) from e
    build_app(args.out_path).launch(server_port=args.port)


if __name__ == "__main__":
    main()
