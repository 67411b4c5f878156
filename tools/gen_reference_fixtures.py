"""Generate golden parity fixtures by running the REFERENCE torch
implementation (/root/reference) on fixed inputs and dumping its
filter/smoother outputs to tests/fixtures/reference_lgssm.npz.

Run once (requires the reference checkout + torch cpu):
    python tools/gen_reference_fixtures.py
The resulting .npz is committed; tests/test_reference_parity.py consumes it
without needing torch or the reference at test time.

Note: the reference package is import-broken as shipped (kvae/vae/losses.py:4
imports the nonexistent kvae.vae.config); we alias it to kvae.utils.config
before importing, as any reference user must.
"""
import importlib
import sys
from pathlib import Path

import numpy as np

REFERENCE = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "reference_lgssm.npz"


def main():
    sys.path.insert(0, str(REFERENCE))
    # work around the reference's broken import
    cfg_mod = importlib.import_module("kvae.utils.config")
    sys.modules["kvae.vae.config"] = cfg_mod

    import torch

    from kvae.kalman.kalman_filter import KalmanFilter
    from kvae.kalman.switch_dyn_param import (
        StickyRegimePrior,
        SwitchingDynamicsParameter,
    )

    torch.manual_seed(7)
    n, m, p = 4, 4, 2
    B, T = 3, 12

    # stable random A
    A = torch.eye(n) + 0.25 * torch.randn(n, n)
    rho = torch.linalg.eigvals(A).abs().max().real
    A = A / (rho + 1e-6) * 0.95
    Bm = 0.1 * torch.randn(n, m)
    C = 0.5 * torch.randn(p, n)
    Q = 0.02 * torch.eye(n)

    dyn = SwitchingDynamicsParameter(
        A.unsqueeze(0), Bm.unsqueeze(0), C.unsqueeze(0), Q=Q.unsqueeze(0),
        # K=1 never consults the prior, but the default K=1 prior divides by
        # zero at construction; hand it a valid one.
        prior=StickyRegimePrior(2, p_stay=0.9),
    )
    mu0 = torch.zeros(n)
    sigma0 = 5.0 * torch.eye(n)
    std_dyn, std_obs = 0.02 ** 0.5, 0.03 ** 0.5
    kf = KalmanFilter(std_dyn, std_obs, mu0, sigma0, dyn)
    kf.eval()

    Y = torch.randn(B, T, p)
    U = 0.1 * torch.randn(B, T, m)
    mask = torch.ones(B, T)
    mask[:, 4:8] = 0.0
    mask[0, 10] = 0.0

    with torch.no_grad():
        (mus_smooth, sig_smooth, mus_filt, sig_filt,
         mus_pred, sig_pred, A_list, B_list, C_list) = kf.smooth(Y, U, mask=mask)

    def npz(t):
        return t.detach().numpy().astype(np.float32)

    OUT.parent.mkdir(parents=True, exist_ok=True)
    np.savez(
        OUT,
        A=npz(A), B=npz(Bm), C=npz(C), Q=npz(Q),
        mu0=npz(mu0), sigma0=npz(sigma0),
        R=npz((std_obs ** 2) * torch.eye(p)),
        Y=npz(Y), U=npz(U), mask=npz(mask),
        mus_filt=npz(mus_filt.squeeze(-1) if mus_filt.dim() == 4 else mus_filt),
        sigmas_filt=npz(sig_filt),
        mus_pred=npz(mus_pred.squeeze(-1) if mus_pred.dim() == 4 else mus_pred),
        sigmas_pred=npz(sig_pred),
        mus_smooth=npz(mus_smooth.squeeze(-1) if mus_smooth.dim() == 4 else mus_smooth),
        sigmas_smooth=npz(sig_smooth),
    )
    print(f"wrote {OUT}")
    print("filt mean head:", npz(mus_filt)[0, :2])


if __name__ == "__main__":
    main()
