"""Batched data-parallel inference over a device mesh.

The scale-out path of SURVEY.md §2.10/§7.8: batched synthesis fans out across
every chip of a (possibly multi-host) mesh — requests are grouped into fixed
shape buckets, sharded on the `data` axis, and decoded in one pjit'ted call
per bucket. XLA keeps all communication on ICI; with
`tpu_tts.parallel.init_distributed` the same code spans hosts.
"""

from typing import Dict, List, Optional, Sequence

import numpy as np


class BatchedSynthesizer:
    """Fan batched token requests across the mesh for a VITS-family model."""

    def __init__(
        self,
        model,
        devices=None,
        text_bucket: int = 64,
        mel_bucket: int = 256,
        model_shards: int = 1,
    ):
        """`model_shards` > 1 builds a 2D (data × model) mesh and runs the
        waveform decoder time-sharded over the model axis (halo exchange via
        `hifigan_apply_sharded`) — for when the decoder's activations at the
        target batch exceed one chip's HBM."""
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        self.model = model
        devices = np.array(devices if devices is not None else jax.devices())
        self.model_shards = int(model_shards)
        assert len(devices) % self.model_shards == 0
        self.n_data = len(devices) // self.model_shards
        if self.model_shards > 1:
            self.mesh = Mesh(devices.reshape(self.n_data, self.model_shards), ("data", "model"))
        else:
            self.mesh = Mesh(devices, ("data",))
        self.n_devices = len(devices)
        self.data_sh = NamedSharding(self.mesh, P("data"))
        self.repl_sh = NamedSharding(self.mesh, P())
        self.text_bucket = text_bucket
        self.mel_bucket = mel_bucket
        self._fns: Dict = {}
        # params replicated once
        self.params = jax.device_put(model.params, self.repl_sh)

    def _bucketed(self, n: int, step: int) -> int:
        return int(np.ceil(max(n, 1) / step)) * step

    def synthesize_batch(self, token_ids_list: Sequence[np.ndarray], seed: int = 0) -> List[np.ndarray]:
        """Token id sequences → list of waveforms (trimmed to true lengths).

        Pads the batch to a device-divisible size and bucketed text length,
        runs one sharded jit call, returns per-request audio.
        """
        import jax
        import jax.numpy as jnp

        from tpu_tts.models.vits import VitsNet

        n_req = len(token_ids_list)
        lens = [len(t) for t in token_ids_list]
        T_text = self._bucketed(max(lens), self.text_bucket)
        B = self._bucketed(n_req, self.n_data)
        x = np.zeros((B, T_text), dtype=np.int32)
        xl = np.ones((B,), dtype=np.int32)
        for i, t in enumerate(token_ids_list):
            x[i, : len(t)] = t
            xl[i] = len(t)
        y_max = self._bucketed(int(T_text) * 12, self.mel_bucket)

        key = (B, T_text, y_max)
        if key not in self._fns:
            net = self.model.net

            if self.model_shards > 1:
                from tpu_tts.parallel.sharded_decoder import hifigan_apply_sharded
                from tpu_tts.vocoder.models.hifigan_generator import HifiganGenerator

                a = self.model.args
                mesh = self.mesh
                mp = self.model_shards
                # standalone module mirroring VitsNet.setup's waveform_decoder
                gen_params_tree = self.params["generator"]["waveform_decoder"]
                gen_mod = HifiganGenerator(
                    in_channels=a.hidden_channels,
                    out_channels=1,
                    resblock_type=str(a.resblock_type_decoder),
                    resblock_dilation_sizes=tuple(tuple(d) for d in a.resblock_dilation_sizes_decoder),
                    resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                    upsample_kernel_sizes=tuple(a.upsample_kernel_sizes_decoder),
                    upsample_initial_channel=a.upsample_initial_channel_decoder,
                    upsample_factors=tuple(a.upsample_rates_decoder),
                    cond_channels=0 if "cond_layer" not in gen_params_tree else a.d_vector_dim or a.speaker_embedding_channels,
                )
                apply_fn = lambda p, zz, gg: gen_mod.apply({"params": p}, zz, g=gg)

                def fn(params, xi, xli, rng):
                    out = net.apply(
                        {"params": params}, xi, xli, y_max,
                        method=VitsNet.inference, decode=False,
                        rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
                    )
                    g_arr = jnp.asarray(out["g"])  # python 0 when unconditioned
                    wav = hifigan_apply_sharded(
                        params["waveform_decoder"], out["z_in"], mesh, "model",
                        g=None if g_arr.ndim == 0 else g_arr,
                        resblock_kernel_sizes=tuple(a.resblock_kernel_sizes_decoder),
                        resblock_dilation_sizes=tuple(tuple(d) for d in a.resblock_dilation_sizes_decoder),
                        upsample_factors=tuple(a.upsample_rates_decoder),
                        upsample_kernel_sizes=tuple(a.upsample_kernel_sizes_decoder),
                        batch_axis="data",
                        apply_fn=apply_fn,
                    )
                    return wav, out["y_lengths"]

                assert y_max % mp == 0, f"mel bucket {y_max} must divide model_shards {mp}"
            else:

                def fn(params, xi, xli, rng):
                    out = net.apply(
                        {"params": params}, xi, xli, y_max,
                        method=VitsNet.inference,
                        rngs={"noise": rng, "sdp": jax.random.fold_in(rng, 1)},
                    )
                    return out["model_outputs"], out["y_lengths"]

            self._fns[key] = jax.jit(fn)

        xd = jax.device_put(x, self.data_sh)
        xld = jax.device_put(xl, self.data_sh)
        gen_params = self.params["generator"] if isinstance(self.params, dict) and "generator" in self.params else self.params
        wavs, y_lens = self._fns[key](gen_params, xd, xld, jax.random.PRNGKey(seed))
        wavs = np.asarray(wavs)
        y_lens = np.asarray(y_lens)
        if hasattr(self.model, "args") and hasattr(self.model.args, "upsample_rates_decoder"):
            hop = int(np.prod(self.model.args.upsample_rates_decoder))
        else:
            hop = self.model.ap.hop_length if self.model.ap else 256
        return [wavs[i, : int(y_lens[i]) * hop, 0] for i in range(n_req)]
