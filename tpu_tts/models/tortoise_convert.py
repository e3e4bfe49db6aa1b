"""Reference Tortoise torch checkpoints → flax converters.

Maps the released state dicts (`autoregressive.pth` → layers/tortoise/
autoregressive.py:262 `UnifiedVoice`, `clvp2.pth` → clvp.py:20 `CLVP`
(xformers variant), `diffusion_decoder.pth` → diffusion_decoder.py:141
`DiffusionTts`, `rlg_auto.pth`/`rlg_diffuser.pth` → random_latent_generator.
py:39) onto the modules in `tpu_tts.layers.tortoise_{ar,clvp,diffusion}`.
The `vocoder.pth` UnivNet generator routes through the existing
`tpu_tts.vocoder.models.vocoder_convert` UnivNet mapping.
"""

import re
from typing import Any, Dict

import numpy as np

from tpu_tts.models.vits_convert import _conv1d, _dense, _set


def _map_attention_block(sd: Dict[str, np.ndarray], out: Dict, src: str, dst: str):
    """arch_utils.py:83 AttentionBlock leaves (1×1 convs → Dense)."""
    _set(out, f"{dst}/norm/scale", sd[f"{src}.norm.weight"])
    _set(out, f"{dst}/norm/bias", sd[f"{src}.norm.bias"])
    _set(out, f"{dst}/qkv/kernel", _dense(sd[f"{src}.qkv.weight"]))
    _set(out, f"{dst}/qkv/bias", sd[f"{src}.qkv.bias"])
    _set(out, f"{dst}/proj_out/kernel", _dense(sd[f"{src}.proj_out.weight"]))
    _set(out, f"{dst}/proj_out/bias", sd[f"{src}.proj_out.bias"])
    rel = f"{src}.relative_pos_embeddings.relative_attention_bias.weight"
    if rel in sd:
        _set(out, f"{dst}/relative_pos_embeddings/relative_attention_bias", sd[rel])


def _map_gpt2_block(sd: Dict[str, np.ndarray], out: Dict, src: str, dst: str):
    """HF GPT2 block → our GPTBlock (transformers Conv1D stores `[in, out]`,
    copied into flax Dense kernels with no transpose)."""
    for ln, mine in (("ln_1", "ln1"), ("ln_2", "ln2")):
        _set(out, f"{dst}/{mine}/scale", sd[f"{src}.{ln}.weight"])
        _set(out, f"{dst}/{mine}/bias", sd[f"{src}.{ln}.bias"])
    for theirs, mine in (
        ("attn.c_attn", "attn/qkv"), ("attn.c_proj", "attn/proj"),
        ("mlp.c_fc", "mlp_fc"), ("mlp.c_proj", "mlp_proj"),
    ):
        _set(out, f"{dst}/{mine}/kernel", sd[f"{src}.{theirs}.weight"])
        _set(out, f"{dst}/{mine}/bias", sd[f"{src}.{theirs}.bias"])


def convert_unified_voice_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`UnifiedVoice.state_dict()` → `tortoise_ar.UnifiedVoice` params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}
    _set(out, "conditioning_encoder/init/kernel", _dense(sd["conditioning_encoder.init.weight"]))
    _set(out, "conditioning_encoder/init/bias", sd["conditioning_encoder.init.bias"])
    n_attn = 1 + max(
        int(m.group(1)) for k in sd
        if (m := re.match(r"conditioning_encoder\.attn\.(\d+)\.", k))
    )
    for i in range(n_attn):
        _map_attention_block(sd, out, f"conditioning_encoder.attn.{i}", f"conditioning_encoder/attn_{i}")
    for emb in ("text_embedding", "mel_embedding"):
        _set(out, f"{emb}/embedding", sd[f"{emb}.weight"])
    for emb in ("mel_pos_embedding", "text_pos_embedding"):
        _set(out, f"{emb}/embedding", sd[f"{emb}.emb.weight"])
    n_layer = 1 + max(
        int(m.group(1)) for k in sd if (m := re.match(r"gpt\.h\.(\d+)\.", k))
    )
    for i in range(n_layer):
        _map_gpt2_block(sd, out, f"gpt.h.{i}", f"h_{i}")
    _set(out, "ln_f/scale", sd["gpt.ln_f.weight"])
    _set(out, "ln_f/bias", sd["gpt.ln_f.bias"])
    _set(out, "final_norm/scale", sd["final_norm.weight"])
    _set(out, "final_norm/bias", sd["final_norm.bias"])
    for head in ("text_head", "mel_head"):
        _set(out, f"{head}/kernel", _dense(sd[f"{head}.weight"]))
        _set(out, f"{head}/bias", sd[f"{head}.bias"])
    return out


def convert_clvp_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`CLVP.state_dict()` (use_xformers=True) → `tortoise_clvp.CLVP` params.

    xtransformers layer list alternates attention (even index) and
    feedforward (odd); norms ModuleList slot 0 holds the pre-branch RMSNorm;
    CheckpointedLayer wraps the block as `.1.wrap`."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}
    _set(out, "text_emb/embedding", sd["text_emb.weight"])
    _set(out, "speech_emb/embedding", sd["speech_emb.weight"])
    _set(out, "to_text_latent/kernel", _dense(sd["to_text_latent.weight"]))
    _set(out, "to_speech_latent/kernel", _dense(sd["to_speech_latent.weight"]))
    _set(out, "temperature", sd["temperature"].reshape(()))
    for tower in ("text_transformer", "speech_transformer"):
        pre = f"{tower}.transformer"
        _set(out, f"{tower}/final_ln/scale", sd[f"{pre}.norm.weight"])
        _set(out, f"{tower}/final_ln/bias", sd[f"{pre}.norm.bias"])
        idxs = sorted(
            {
                int(m.group(1))
                for k in sd
                if (m := re.match(re.escape(pre) + r"\.attn_layers\.layers\.(\d+)\.", k))
            }
        )
        for li in idxs:
            src = f"{pre}.attn_layers.layers.{li}"
            # the wrap level is absent when checkpointing was disabled
            wrap = f"{src}.1.wrap" if f"{src}.1.wrap.to_q.weight" in sd or f"{src}.1.wrap.net.0.proj.weight" in sd else f"{src}.1"
            blk = li // 2
            if li % 2 == 0:  # attention
                _set(out, f"{tower}/norm_a_{blk}/g", sd[f"{src}.0.0.g"])
                for p in ("to_q", "to_k", "to_v"):
                    _set(out, f"{tower}/attn_{blk}/{p}/kernel", _dense(sd[f"{wrap}.{p}.weight"]))
                _set(out, f"{tower}/attn_{blk}/to_out/kernel", _dense(sd[f"{wrap}.to_out.weight"]))
                _set(out, f"{tower}/attn_{blk}/to_out/bias", sd[f"{wrap}.to_out.bias"])
            else:  # feedforward (GLU)
                _set(out, f"{tower}/norm_f_{blk}/g", sd[f"{src}.0.0.g"])
                _set(out, f"{tower}/ff_{blk}/glu_proj/kernel", _dense(sd[f"{wrap}.net.0.proj.weight"]))
                _set(out, f"{tower}/ff_{blk}/glu_proj/bias", sd[f"{wrap}.net.0.proj.bias"])
                _set(out, f"{tower}/ff_{blk}/out/kernel", _dense(sd[f"{wrap}.net.3.weight"]))
                _set(out, f"{tower}/ff_{blk}/out/bias", sd[f"{wrap}.net.3.bias"])
    return out


def _map_diff_resblock(sd: Dict[str, np.ndarray], out: Dict, src: str, dst: str):
    """diffusion_decoder.py:60 ResBlock: in_layers[0,2], emb_layers[1],
    out_layers[0,3], optional skip_connection."""
    _set(out, f"{dst}/in_norm/scale", sd[f"{src}.in_layers.0.weight"])
    _set(out, f"{dst}/in_norm/bias", sd[f"{src}.in_layers.0.bias"])
    _set(out, f"{dst}/in_conv/conv/kernel", _conv1d(sd[f"{src}.in_layers.2.weight"]))
    _set(out, f"{dst}/in_conv/conv/bias", sd[f"{src}.in_layers.2.bias"])
    _set(out, f"{dst}/emb_proj/kernel", _dense(sd[f"{src}.emb_layers.1.weight"]))
    _set(out, f"{dst}/emb_proj/bias", sd[f"{src}.emb_layers.1.bias"])
    _set(out, f"{dst}/out_norm/scale", sd[f"{src}.out_layers.0.weight"])
    _set(out, f"{dst}/out_norm/bias", sd[f"{src}.out_layers.0.bias"])
    _set(out, f"{dst}/out_conv/conv/kernel", _conv1d(sd[f"{src}.out_layers.3.weight"]))
    _set(out, f"{dst}/out_conv/conv/bias", sd[f"{src}.out_layers.3.bias"])
    if f"{src}.skip_connection.weight" in sd:
        _set(out, f"{dst}/skip/conv/kernel", _conv1d(sd[f"{src}.skip_connection.weight"]))
        _set(out, f"{dst}/skip/conv/bias", sd[f"{src}.skip_connection.bias"])


def convert_diffusion_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`DiffusionTts.state_dict()` → `tortoise_diffusion.DiffusionTts`."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}
    _set(out, "inp_block/conv/kernel", _conv1d(sd["inp_block.weight"]))
    _set(out, "inp_block/conv/bias", sd["inp_block.bias"])
    for i, mine in ((0, "time_embed_1"), (2, "time_embed_2")):
        _set(out, f"{mine}/kernel", _dense(sd[f"time_embed.{i}.weight"]))
        _set(out, f"{mine}/bias", sd[f"time_embed.{i}.bias"])
    _set(out, "code_embedding/embedding", sd["code_embedding.weight"])
    for i in range(3):
        _map_attention_block(sd, out, f"code_converter.{i}", f"code_converter_{i}")
    _set(out, "code_norm_scale", sd["code_norm.weight"])
    _set(out, "code_norm_bias", sd["code_norm.bias"])
    _set(out, "latent_conditioner_conv/conv/kernel", _conv1d(sd["latent_conditioner.0.weight"]))
    _set(out, "latent_conditioner_conv/conv/bias", sd["latent_conditioner.0.bias"])
    for i in range(4):
        _map_attention_block(sd, out, f"latent_conditioner.{i + 1}", f"latent_conditioner_{i}")
    for i, mine in ((0, "contextual_embedder_conv1"), (1, "contextual_embedder_conv2")):
        _set(out, f"{mine}/conv/kernel", _conv1d(sd[f"contextual_embedder.{i}.weight"]))
        _set(out, f"{mine}/conv/bias", sd[f"contextual_embedder.{i}.bias"])
    for i in range(5):
        _map_attention_block(sd, out, f"contextual_embedder.{i + 2}", f"contextual_embedder_{i}")
    _set(out, "unconditioned_embedding",
         np.transpose(sd["unconditioned_embedding"], (0, 2, 1)))
    for i in range(3):
        _map_diff_resblock(sd, out, f"conditioning_timestep_integrator.{i}.resblk",
                           f"cond_timestep_{i}/resblk")
        _map_attention_block(sd, out, f"conditioning_timestep_integrator.{i}.attn",
                             f"cond_timestep_{i}/attn")
    _set(out, "integrating_conv/conv/kernel", _conv1d(sd["integrating_conv.weight"]))
    _set(out, "integrating_conv/conv/bias", sd["integrating_conv.bias"])
    _set(out, "mel_head/conv/kernel", _conv1d(sd["mel_head.weight"]))
    _set(out, "mel_head/conv/bias", sd["mel_head.bias"])
    n_layers = 1 + max(int(m.group(1)) for k in sd if (m := re.match(r"layers\.(\d+)\.", k)))
    for i in range(n_layers):
        if f"layers.{i}.resblk.in_layers.0.weight" in sd:  # DiffusionLayer
            _map_diff_resblock(sd, out, f"layers.{i}.resblk", f"layer_{i}/resblk")
            _map_attention_block(sd, out, f"layers.{i}.attn", f"layer_{i}/attn")
        else:  # trailing plain ResBlock
            _map_diff_resblock(sd, out, f"layers.{i}", f"layer_{i}")
    _set(out, "out_norm/scale", sd["out.0.weight"])
    _set(out, "out_norm/bias", sd["out.0.bias"])
    _set(out, "out_conv/conv/kernel", _conv1d(sd["out.2.weight"]))
    _set(out, "out_conv/conv/bias", sd["out.2.bias"])
    return out


def convert_tortoise_vocoder_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Tortoise `vocoder.pth` (layers/tortoise/vocoder.py:277 UnivNetGenerator,
    the original mindslab naming; checkpoint dict key `model_g`) → our flax
    `UnivnetGenerator` params (instantiate with kpnet_lrelu_slope=0.2,
    post_lrelu_slope=0.2, pad_mode="reflect", cond_channels=100)."""
    from tpu_tts.models.vits_convert import _convtr1d, _fold_param_pairs, _wn_decompose

    if "model_g" in state_dict:
        state_dict = state_dict["model_g"]
    sd = _fold_param_pairs({k: np.asarray(v) for k, v in state_dict.items()})
    tree: Dict[str, Any] = {}

    def put(src, dst_name, transpose=False):
        w = sd[src + ".weight"]
        kv, g = _wn_decompose(_convtr1d(w) if transpose else _conv1d(w))
        _set(tree, f"{dst_name}/v", kv)
        _set(tree, f"{dst_name}/g", g)
        if src + ".bias" in sd:
            _set(tree, f"{dst_name}/bias", sd[src + ".bias"])

    put("conv_pre", "conv_pre")
    put("conv_post.1", "conv_post")
    n_blocks = len({int(m.group(1)) for k in sd if (m := re.match(r"res_stack\.(\d+)\.", k))})
    for n in range(n_blocks):
        base = f"res_stack.{n}"
        put(f"{base}.convt_pre.1", f"lvc_{n}/convt_pre", transpose=True)
        n_convs = len(
            {int(m.group(1)) for k in sd if (m := re.match(rf"res_stack\.{n}\.conv_blocks\.(\d+)\.", k))}
        )
        for i in range(n_convs):
            put(f"{base}.conv_blocks.{i}.1", f"lvc_{n}/conv_{i}")
        kp = f"{base}.kernel_predictor"
        put(f"{kp}.input_conv.0", f"lvc_{n}/kernel_predictor/input_conv")
        for j in range(3):
            put(f"{kp}.residual_convs.{j}.1", f"lvc_{n}/kernel_predictor/res{j}_conv1")
            put(f"{kp}.residual_convs.{j}.3", f"lvc_{n}/kernel_predictor/res{j}_conv2")
        put(f"{kp}.kernel_conv", f"lvc_{n}/kernel_predictor/kernel_conv")
        put(f"{kp}.bias_conv", f"lvc_{n}/kernel_predictor/bias_conv")
    return tree


def convert_classifier_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """`classifier.pth` (classifier.py:132 AudioMiniEncoderWithClassifierHead)
    → `tortoise_classifier` params."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}
    _set(out, "enc/init/conv/kernel", _conv1d(sd["enc.init.0.weight"]))
    _set(out, "enc/init/conv/bias", sd["enc.init.0.bias"])
    n_res = 1 + max(int(m.group(1)) for k in sd if (m := re.match(r"enc\.res\.(\d+)\.", k)))
    for i in range(n_res):
        if f"enc.res.{i}.op.weight" in sd:  # Downsample slot
            _set(out, f"enc/res_{i}/conv/kernel", _conv1d(sd[f"enc.res.{i}.op.weight"]))
            _set(out, f"enc/res_{i}/conv/bias", sd[f"enc.res.{i}.op.bias"])
        else:
            _set(out, f"enc/res_{i}/in_norm/scale", sd[f"enc.res.{i}.in_layers.0.weight"])
            _set(out, f"enc/res_{i}/in_norm/bias", sd[f"enc.res.{i}.in_layers.0.bias"])
            _set(out, f"enc/res_{i}/in_conv/conv/kernel", _conv1d(sd[f"enc.res.{i}.in_layers.2.weight"]))
            _set(out, f"enc/res_{i}/in_conv/conv/bias", sd[f"enc.res.{i}.in_layers.2.bias"])
            _set(out, f"enc/res_{i}/out_norm/scale", sd[f"enc.res.{i}.out_layers.0.weight"])
            _set(out, f"enc/res_{i}/out_norm/bias", sd[f"enc.res.{i}.out_layers.0.bias"])
            _set(out, f"enc/res_{i}/out_conv/conv/kernel", _conv1d(sd[f"enc.res.{i}.out_layers.3.weight"]))
            _set(out, f"enc/res_{i}/out_conv/conv/bias", sd[f"enc.res.{i}.out_layers.3.bias"])
    _set(out, "enc/final_norm/scale", sd["enc.final.0.weight"])
    _set(out, "enc/final_norm/bias", sd["enc.final.0.bias"])
    _set(out, "enc/final_conv/conv/kernel", _conv1d(sd["enc.final.2.weight"]))
    _set(out, "enc/final_conv/conv/bias", sd["enc.final.2.bias"])
    n_attn = 1 + max(int(m.group(1)) for k in sd if (m := re.match(r"enc\.attn\.(\d+)\.", k)))
    for a in range(n_attn):
        _map_attention_block(sd, out, f"enc.attn.{a}", f"enc/attn_{a}")
    _set(out, "head/kernel", _dense(sd["head.weight"]))
    _set(out, "head/bias", sd["head.bias"])
    return out


def convert_rlg_state_dict(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """random_latent_generator.py:39 `RandomLatentConverter` → param tree for
    `tortoise_rlg` (5 EqualLinear + 1 Linear)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    out: Dict[str, Any] = {}
    for i in range(5):
        _set(out, f"eq_{i}_weight", sd[f"layers.{i}.weight"])
        _set(out, f"eq_{i}_bias", sd[f"layers.{i}.bias"])
    _set(out, "final/kernel", _dense(sd["layers.5.weight"]))
    _set(out, "final/bias", sd["layers.5.bias"])
    return out
