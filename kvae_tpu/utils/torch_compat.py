"""Reference (PyTorch) checkpoint converter.

Lets a reference user bring their trained `.pt` checkpoints (reference
Checkpointer payloads, kvae/train/utils.py:177-185, or Lightning VAE ckpts,
kvae/vae/train_vae.py) into this framework with numerics preserved:

  - conv kernels:   torch [out,in,kh,kw]      -> flax [kh,kw,in,out]
  - dense kernels:  torch [out,in]            -> flax [in,out]
  - encoder fc_*:   the flatten order differs (torch flattens NCHW -> C-major,
    we flatten NHWC -> C-minor) -> permute the input dimension accordingly
  - decoder fc:     output reshapes to [C0,s,s] there vs [s,s,C0] here
    -> permute the output dimension
  - decoder convs:  torch PixelShuffle consumes channel order (c, i, j); our
    depth-to-space consumes (i, j, c) -> permute conv out-channels
  - LSTM/GRU:       torch keeps gate blocks (i,f,g,o)/(r,z,n) — same orders
    as models/rnn.py; weight_ih/weight_hh transpose, LSTM biases sum
    (bias_ih + bias_hh), GRU biases stay separate

Only numpy is required for conversion from in-memory state dicts; reading
`.pt` files needs torch (baked in here, gated import).

This is capability parity with reference kvae/vae/weights.py:13-70
(`load_vae_weights`) plus full-KVAE checkpoint migration, and it powers the
golden parity tests (tests/test_torch_parity.py).
"""
from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from kvae_tpu.config import KVAEConfig


Array = np.ndarray
StateDict = Mapping[str, Array]


def _np(x) -> Array:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _conv_kernel(w: Array) -> Array:
    return _np(w).transpose(2, 3, 1, 0)  # [out,in,kh,kw] -> [kh,kw,in,out]


def _dense_kernel(w: Array) -> Array:
    return _np(w).T


def convert_encoder(sd: StateDict, cfg: KVAEConfig) -> Dict:
    """Reference Encoder state_dict (keys conv_layers.{0,2,4}., fc_mu.,
    fc_var.0.) -> our flax Encoder params."""
    out: Dict = {}
    n_convs = len(cfg.encoder_channels)
    for i in range(n_convs):
        t_idx = 2 * i  # Conv,ReLU pairs in the torch Sequential
        out[f"Conv_{i}"] = {
            "kernel": _conv_kernel(sd[f"conv_layers.{t_idx}.weight"]),
            "bias": _np(sd[f"conv_layers.{t_idx}.bias"]),
        }
    # flattened conv output: torch C-major (C,H,W) vs ours (H,W,C)
    s = cfg.img_size // (cfg.encoder_stride ** n_convs)
    c_last = cfg.encoder_channels[-1]

    def fc_in_permuted(w: Array) -> Array:
        w = _np(w).reshape(-1, c_last, s, s)      # [out, C, H, W]
        w = w.transpose(2, 3, 1, 0)               # [H, W, C, out]
        return w.reshape(s * s * c_last, -1)      # [in(HWC-order), out]

    out["fc_mu"] = {
        "kernel": fc_in_permuted(sd["fc_mu.weight"]),
        "bias": _np(sd["fc_mu.bias"]),
    }
    out["fc_var"] = {
        "kernel": fc_in_permuted(sd["fc_var.0.weight"]),
        "bias": _np(sd["fc_var.0.bias"]),
    }
    return out


def _pixelshuffle_out_perm(c_out: int, r: int = 2) -> Array:
    """Index map: our depth-to-space channel (i, j, c) <- torch (c, i, j)."""
    perm = np.empty(c_out * r * r, dtype=np.int64)
    for i in range(r):
        for j in range(r):
            for c in range(c_out):
                ours = (i * r + j) * c_out + c
                theirs = c * r * r + i * r + j
                perm[ours] = theirs
    return perm


def convert_decoder(sd: StateDict, cfg: KVAEConfig) -> Dict:
    """Reference Decoder state_dict (fc., deconv_layers.{0,3,6,...}.) ->
    our flax Decoder params."""
    out: Dict = {}
    channels = list(cfg.decoder_channels)
    r = 2
    s = cfg.img_size // (r ** len(channels))
    c0 = channels[0]

    # fc: output reshaped [C0,s,s] there, [s,s,C0] here
    w = _np(sd["fc.weight"]).reshape(c0, s, s, -1)   # [C0, H, W, in]
    w = w.transpose(1, 2, 0, 3).reshape(s * s * c0, -1)  # [(H,W,C0), in]
    b = _np(sd["fc.bias"]).reshape(c0, s, s).transpose(1, 2, 0).reshape(-1)
    out["fc"] = {"kernel": w.T, "bias": b}

    # deconv stack: torch Sequential [Conv,PixelShuffle,ReLU]*k + [Conv,PS]
    t_indices = [3 * i for i in range(len(channels) - 1)]
    t_indices.append(3 * (len(channels) - 1))
    out_chs = [channels[i + 1] for i in range(len(channels) - 1)] + [cfg.img_channels]
    for i, (t_idx, c_out) in enumerate(zip(t_indices, out_chs)):
        kern = _conv_kernel(sd[f"deconv_layers.{t_idx}.weight"])  # [kh,kw,in,out]
        bias = _np(sd[f"deconv_layers.{t_idx}.bias"])
        perm = _pixelshuffle_out_perm(c_out, r)
        out[f"Conv_{i}"] = {"kernel": kern[..., perm], "bias": bias[perm]}
    return out


def convert_lstm_dynamics(sd: StateDict, cfg: KVAEConfig) -> Dict:
    """Reference DynamicsParameter (kvae/kalman/dyn_param.py) -> our
    LSTMAlphaDynamics params."""
    out: Dict = {
        "A": _np(sd["A"]), "B": _np(sd["B"]), "C": _np(sd["C"]),
    }
    if cfg.num_modes > 1:
        out["lstm_wi"] = _dense_kernel(sd["lstm.weight_ih_l0"])
        out["lstm_wh"] = _dense_kernel(sd["lstm.weight_hh_l0"])
        out["lstm_b"] = _np(sd["lstm.bias_ih_l0"]) + _np(sd["lstm.bias_hh_l0"])
        out["head_w"] = _dense_kernel(sd["head_w.weight"])
        out["head_b"] = _np(sd["head_w.bias"])
    return out


def convert_switching_dynamics(sd: StateDict, cfg: KVAEConfig) -> Dict:
    """Reference SwitchingDynamicsParameter (kvae/kalman/switch_dyn_param.py)
    -> our SwitchingDynamics params."""
    out: Dict = {
        "A": _np(sd["A"]), "B": _np(sd["B"]), "C": _np(sd["C"]),
        "Q": _np(sd["Q"]),
    }
    if cfg.num_modes > 1:
        pref = "markov_regime_posterior."
        post = {
            "gru_fwd_wi": _dense_kernel(sd[pref + "bigru.weight_ih_l0"]),
            "gru_fwd_wh": _dense_kernel(sd[pref + "bigru.weight_hh_l0"]),
            "gru_fwd_bi": _np(sd[pref + "bigru.bias_ih_l0"]),
            "gru_fwd_bh": _np(sd[pref + "bigru.bias_hh_l0"]),
            "gru_bwd_wi": _dense_kernel(sd[pref + "bigru.weight_ih_l0_reverse"]),
            "gru_bwd_wh": _dense_kernel(sd[pref + "bigru.weight_hh_l0_reverse"]),
            "gru_bwd_bi": _np(sd[pref + "bigru.bias_ih_l0_reverse"]),
            "gru_bwd_bh": _np(sd[pref + "bigru.bias_hh_l0_reverse"]),
            "linear_head": {
                "kernel": _dense_kernel(sd[pref + "linear_head.weight"]),
                "bias": _np(sd[pref + "linear_head.bias"]),
            },
            "init_head": {
                "kernel": _dense_kernel(sd[pref + "init_head.weight"]),
                "bias": _np(sd[pref + "init_head.bias"]),
            },
        }
        out["posterior"] = post
    return out


def _subdict(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_kvae_state_dict(sd: StateDict, cfg: KVAEConfig) -> Dict:
    """Full reference KVAE state_dict -> our KVAE 'params' tree."""
    params = {
        "encoder": convert_encoder(_subdict(sd, "encoder."), cfg),
        "decoder": convert_decoder(_subdict(sd, "decoder."), cfg),
    }
    dyn_sd = _subdict(sd, "kalman_filter.dyn_params.")
    if cfg.dynamics_model.lower() == "switching":
        params["dynamics"] = convert_switching_dynamics(dyn_sd, cfg)
    else:
        params["dynamics"] = convert_lstm_dynamics(dyn_sd, cfg)
    return params


def load_vae_weights(params: Dict, sd: StateDict, cfg: KVAEConfig) -> Dict:
    """Replace encoder/decoder in an existing params tree from a (possibly
    Lightning-prefixed) state dict — parity with reference
    kvae/vae/weights.py:13-70."""
    enc = {k.split("encoder.", 1)[-1]: v for k, v in sd.items() if "encoder." in k}
    dec = {k.split("decoder.", 1)[-1]: v for k, v in sd.items() if "decoder." in k}
    new = dict(params)
    if enc:
        new["encoder"] = convert_encoder(enc, cfg)
    if dec:
        new["decoder"] = convert_decoder(dec, cfg)
    return new


def load_reference_checkpoint(path: str, cfg: KVAEConfig) -> Dict:
    """Read a reference `.pt` checkpoint file (Checkpointer payload or plain
    state_dict) and return our KVAE params tree. Requires torch."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state" in ckpt:
        sd = ckpt["model_state"]
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return convert_kvae_state_dict({k: _np(v) for k, v in sd.items()}, cfg)
