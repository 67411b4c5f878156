"""Generate tests/fixtures/reference_torch_parity.npz by running the
REFERENCE torch model components on fixed inputs and saving their weights
(raw state_dict arrays) + deterministic outputs.

The paired test (tests/test_torch_parity.py) converts the saved weights with
kvae_tpu.utils.torch_compat and checks our modules reproduce the reference
outputs within fp32 tolerance — verifying every weight-layout conversion
(conv, dense flatten order, pixel-shuffle channel order, LSTM/GRU gates).

Deterministic paths only (encoder means/vars, decoder logits, alpha chain on
a FIXED input sequence, BiGRU posterior logits, K=1 smoother) — sampling RNGs
can never be bit-matched across frameworks.

Run once: python tools/gen_torch_parity_fixture.py
"""
import importlib
import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")
OUT = (
    Path(__file__).resolve().parent.parent
    / "tests" / "fixtures" / "reference_torch_parity.npz"
)


def main():
    sys.path.insert(0, str(REFERENCE))
    sys.modules["kvae.vae.config"] = importlib.import_module("kvae.utils.config")

    import torch

    from kvae.kalman.dyn_param import DynamicsParameter
    from kvae.kalman.switch_dyn_param import MarkovVariationalRegimePosterior
    from kvae.utils.config import KVAEConfig
    from kvae.vae.vae import Decoder, Encoder

    torch.manual_seed(11)
    cfg = KVAEConfig()  # defaults: a=2, z=4, K=3, channels 32x3, img 32

    data = {}

    def dump(prefix, module):
        for k, v in module.state_dict().items():
            data[f"{prefix}{k}"] = v.detach().numpy().astype(np.float32)

    # --- encoder ---
    enc = Encoder(cfg).eval()
    x = torch.rand(4, 1, 32, 32)
    with torch.no_grad():
        mu, var = enc(x)
    dump("encoder.", enc)
    data["x"] = x.numpy()
    data["enc_mu"] = mu.numpy()
    data["enc_var"] = var.numpy()

    # --- decoder ---
    dec = Decoder(cfg).eval()
    a = torch.randn(4, cfg.a_dim)
    with torch.no_grad():
        logits = dec(a)
    dump("decoder.", dec)
    data["a_in"] = a.numpy()
    data["dec_logits"] = logits.numpy()

    # --- LSTM-alpha dynamics: stepped on a fixed feedback sequence ---
    A0 = torch.eye(cfg.z_dim).unsqueeze(0).repeat(cfg.num_modes, 1, 1)
    B0 = 0.05 * torch.randn(cfg.num_modes, cfg.z_dim, cfg.u_dim)
    C0 = 0.05 * torch.randn(cfg.num_modes, cfg.a_dim, cfg.z_dim)
    dyn = DynamicsParameter(A0, B0, C0, hidden_lstm=cfg.dynamics_hidden_dim).eval()
    dyn.reset_state()
    y_seq = torch.randn(6, 3, cfg.a_dim)  # [T=6, B=3, p]
    alphas, A_mix = [], []
    with torch.no_grad():
        for t in range(6):
            A_t, _, _ = dyn.compute_step(y_seq[t])
            alphas.append(dyn.state_seq[-1].numpy())
            A_mix.append(A_t.numpy())
    dump("lstm_dyn.", dyn)
    data["dyn_y_seq"] = y_seq.numpy()
    data["dyn_alphas"] = np.stack(alphas)   # [T,B,K]
    data["dyn_A_mix"] = np.stack(A_mix)     # [T,B,n,n]

    # --- BiGRU regime posterior logits ---
    post = MarkovVariationalRegimePosterior(
        cfg.num_modes, input_dim=cfg.a_dim, hidden_size=cfg.dynamics_hidden_dim
    ).eval()
    a_seq = torch.randn(3, 6, cfg.a_dim)
    with torch.no_grad():
        logits_tr, init_logits = post(a_seq)
    dump("posterior.", post)
    data["post_a_seq"] = a_seq.numpy()
    data["post_logits"] = logits_tr.numpy()
    data["post_init_logits"] = init_logits.numpy()

    data["meta_num_modes"] = np.asarray(cfg.num_modes)
    data["meta_hidden"] = np.asarray(cfg.dynamics_hidden_dim)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(OUT, **data)
    print(f"wrote {OUT} ({len(data)} arrays)")


if __name__ == "__main__":
    main()
